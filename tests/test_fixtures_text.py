"""Pin the synthetic-page closed-form text against html_to_text.

synthetic_pages_distributed (fixtures.py) emits text via the closed form
``"Page {i} Page {i} {body}"`` instead of running html_to_text over the
rendered template (an r6 optimization: three regex passes over ~5 KB/page
removed from the synthesis hot loop). This test pins the invariant the
shortcut relies on: for every page the closed form IS byte-identical to
the deterministic extraction of the page's html.
"""

from __future__ import annotations

from prase_spark.extract import html_to_text
from prase_spark.fixtures import synthetic_pages_distributed


def test_synthetic_text_matches_html_to_text(spark):
    pages = synthetic_pages_distributed(spark, 300, partitions=4).collect()
    assert len(pages) == 300
    for row in pages:
        assert row["text"] == html_to_text(row["html"]), row["url"]
        # the invariant the closed form relies on: title twice, then body
        assert row["text"].startswith(
            "Page {0} Page {0} ".format(row["url"].rsplit("/", 1)[-1])
        )
