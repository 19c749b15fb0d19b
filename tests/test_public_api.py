"""The documented public API surface: everything a reference user needs
imports from the package roots and stays importable (no Spark session
required at import time)."""

def test_top_level_exports():
    import prase_spark

    for name in prase_spark.__all__:
        assert callable(getattr(prase_spark, name)) or name in ("KGFrames", "ParisConfig"), name
    # the reference workflow's verbs are all present
    for verb in ("build_kg", "align", "prase_feedback_align", "evaluate_alignment",
                 "extract_triples", "materialize", "load_state", "save_state"):
        assert verb in prase_spark.__all__


def test_datapipe_exports():
    import prase_spark.datapipe as dp

    for name in dp.__all__:
        assert callable(getattr(dp, name)), name
    for verb in ("minhash_dedup", "decontaminate", "chunk_documents",
                 "pack_chunks", "hash_sample", "lsh_topk"):
        assert verb in dp.__all__
