"""Graph export — RENDLER's final artifact (SURVEY.md §2A A5 / §2C C4).

The reference wrote a GraphViz digraph whose nodes are rendered-page
thumbnails and whose edges are hyperlinks BETWEEN TWO RENDERED pages:
``if a in renderResults and b in renderResults: emit edge`` [upstream:
python/export_dot.py ~L10-35].  The dict-membership tests become two left
SEMI joins against the images table; node labels come from an inner join.

Scale shape: the semi joins shuffle on url only; image BYTES are never
read (column pruning keeps the scan to image_id) — at 10^10 scale the
export touches two string columns, not the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def rendered_edges(edges: DataFrame, images: DataFrame) -> DataFrame:
    """Edges whose BOTH endpoints were rendered (the C4 double semi join)."""
    rendered = images.select(F.col("image_id").alias("url"))
    return (
        edges.join(rendered.withColumnRenamed("url", "src"), "src", "left_semi")
        .join(rendered.withColumnRenamed("url", "dst"), "dst", "left_semi")
        .select("src", "dst")
        .distinct()
    )


def export_dot(edges: DataFrame, images: DataFrame, path: str | None = None) -> str:
    """Build the GraphViz text.  Node set + edge set are computed
    distributed and sorted for determinism; only the final (small) text
    assembly happens on the driver — same role as the reference's
    export_dot.py, which also ran driver-side."""
    keep = rendered_edges(edges, images)
    nodes = sorted(
        r["image_id"]
        for r in images.select("image_id").distinct().collect()
    )
    pairs = sorted((r["src"], r["dst"]) for r in keep.collect())
    lines = ["digraph G {"]
    ids = {u: f"n{i}" for i, u in enumerate(nodes)}
    for u in nodes:
        lines.append(f'  {ids[u]} [label="{u}"];')
    for s, d in pairs:
        if s in ids and d in ids:
            lines.append(f"  {ids[s]} -> {ids[d]};")
    lines.append("}")
    text = "\n".join(lines) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text
