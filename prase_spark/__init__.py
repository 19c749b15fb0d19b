"""prase_spark — a PySpark-native knowledge-graph construction + entity-alignment engine.

Brand-new implementation (NOT a port) with the capabilities of the reference
qizhyuan/PRASE-Python (/root/reference): PARIS probabilistic reasoning and
embedding-similarity fusion, re-expressed as Spark DataFrame dataflow:

- KG build: dict-encode + inverse-edge union + functionality aggregation
  (reference: objects/KG.py) -> kgbuild.py
- literal seed join (reference: objects/KGs.py:53-58) -> seed.py
- PARIS Jacobi iteration (reference: model/PARIS.py) -> paris.py
- mutual-best bipartite matching (reference: objects/KGs.py:222-241) -> matching.py
- embedding similarity + fusion (reference: test.py:74-76, objects/KGs.py:265-279)
  -> embed.py
- page-corpus triple extraction (new surface per BASELINE.json input_hint)
  -> extract.py
- web-scale training-data ops (dedup / similarity search / text stats)
  -> datapipe/
"""

from prase_spark.config import ParisConfig, get_spark

__all__ = ["ParisConfig", "get_spark"]
