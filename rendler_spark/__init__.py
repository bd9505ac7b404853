"""rendler_spark — a from-scratch PySpark-native reimplementation of the
query/data-processing capabilities of mesosphere/RENDLER.

RENDLER (the MesosCon demo "rendering web crawler") is a distributed
crawl+render dataflow: a scheduler holds a crawl queue, a render queue, a
seen-URL set, an edge list and a url->image map, and launches one-URL
crawl/render tasks on a Mesos cluster.  This package re-expresses that
dataflow Spark-first, per BASELINE.json's north rule:

* the crawl/render queues  -> a ``frontier`` DataFrame iterated in waves
* the seen-URL ``set()``   -> a sharded ``seen`` table + numpy Bloom
                              prefilter (exact anti-join is authoritative)
* Mesos task scheduling    -> per-host politeness budgets via salted
                              two-phase window ranking (skew-proof)
* crawl/render executors   -> batched Arrow/pandas UDFs (no per-row Python)
* frameworkMessage folding -> Spark shuffles + per-wave checkpoint commits
* export_dot               -> semi-join graph export

The reference checkout at /root/reference is EMPTY (see SURVEY.md §0.1);
all ``[upstream: ...]`` citations in docstrings refer to the public
mesosphere/RENDLER repo reconstructed from public knowledge.
"""

from rendler_spark.hashing import splitmix64, mix
from rendler_spark.synthweb import WebConfig

__all__ = ["splitmix64", "mix", "WebConfig"]
__version__ = "0.1.0"
