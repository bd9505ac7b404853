"""Graph export — RENDLER's final artifact (SURVEY.md §2A A5 / §2C C4).

The reference wrote a GraphViz digraph whose nodes are rendered-page
thumbnails (``image=`` attribute pointing at the rendered file) and whose
edges are hyperlinks BETWEEN TWO RENDERED pages: ``if a in renderResults
and b in renderResults: emit edge`` [upstream: python/export_dot.py
~L10-35].  The dict-membership tests become two left SEMI joins against
the images table.

Scale shape: node and edge LINES are computed as DataFrame columns (the
image-bytes column is never read — column pruning keeps the scan to
image_id/fmt), deterministic node ids come from xxhash64(url), and the
distributed path writes the line sets with ``write.text`` after a range
repartition + within-partition sort, so part files concatenate in global
sorted order without any row ever visiting the driver.  The driver path
(``export_dot``) collects the same line frames — identical bytes, only
viable for demo-sized graphs.  ``export_dot_distributed`` assembles the
final file by streaming part files (file-level IO, bounded memory).
"""

from __future__ import annotations

import shutil
from pathlib import Path

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


def _node_id(col) -> F.Column:
    """Deterministic content-derived node id (no global numbering pass)."""
    return F.concat(F.lit("n"), F.lower(F.hex(F.xxhash64(col))))


def _esc(col) -> F.Column:
    """Escape backslash + double-quote for dot string literals."""
    return F.regexp_replace(F.regexp_replace(col, r"\\", r"\\\\"), '"', r'\"')


def node_lines(images: DataFrame) -> DataFrame:
    """One dot node line per rendered page, thumbnail attribute included
    (reference artifact shape [upstream: python/export_dot.py ~L10-35]).
    Reads only image_id/fmt — never the bytes column."""
    nid = _node_id(F.col("image_id"))
    return images.select(
        F.concat(
            F.lit("  "),
            nid,
            F.lit(' [label="'),
            _esc(F.col("image_id")),
            F.lit('", image="images/'),
            nid,
            F.lit("."),
            F.col("fmt"),
            F.lit('"];'),
        ).alias("line")
    ).distinct()


def edge_lines(edges: DataFrame, images: DataFrame) -> DataFrame:
    """One dot edge line per kept (rendered->rendered) edge."""
    keep = rendered_edges(edges, images)
    return keep.select(
        F.concat(
            F.lit("  "), _node_id(F.col("src")), F.lit(" -> "),
            _node_id(F.col("dst")), F.lit(";"),
        ).alias("line")
    )


HEADER = "digraph G {"
FOOTER = "}"


def export_dot(edges: DataFrame, images: DataFrame, path: str | None = None) -> str:
    """Driver-assembled export (demo-sized graphs): collects the line
    frames and sorts in Python.  Byte-identical to the distributed path
    (both derive from the same Spark expressions; Python's code-point sort
    equals Spark's UTF-8 binary sort)."""
    nl = sorted(r["line"] for r in node_lines(images).collect())
    el = sorted(r["line"] for r in edge_lines(edges, images).collect())
    text = "\n".join([HEADER, *nl, *el, FOOTER]) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def _write_sorted_text(df: DataFrame, out_dir: str, n_parts: int) -> list[Path]:
    """Range-repartition + sort-within-partitions + write.text: part files
    land in global sorted order (part-00000 < part-00001 < ...)."""
    (
        df.repartitionByRange(n_parts, "line")
        .sortWithinPartitions("line")
        .write.mode("overwrite")
        .text(out_dir)
    )
    return sorted(Path(out_dir).glob("part-*"))


def export_dot_distributed(
    edges: DataFrame,
    images: DataFrame,
    work_dir: str,
    path: str | None = None,
    n_parts: int | None = None,
) -> str | None:
    """Scale path: node/edge lines are written distributed as sorted text
    parts; only the header/footer and the file-level concatenation (stream
    copy, O(1) memory) happen driver-side.  At 10^10 nodes you would stop
    at the part files; ``path`` assembles one file for artifact parity.

    Returns the assembled text when ``path`` is None-sized small enough to
    be read back by the caller (we return None and leave the file when
    ``path`` is given, to avoid re-reading a huge artifact)."""
    spark = images.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    nparts = _write_sorted_text(node_lines(images), f"{work_dir}/nodes", n_parts)
    eparts = _write_sorted_text(
        edge_lines(edges, images), f"{work_dir}/edges", n_parts
    )
    target = path or f"{work_dir}/graph.dot"
    with open(target, "w") as out:
        out.write(HEADER + "\n")
        for part in [*nparts, *eparts]:
            with open(part) as f:
                shutil.copyfileobj(f, out)
        out.write(FOOTER + "\n")
    if path:
        return None
    return Path(target).read_text()
