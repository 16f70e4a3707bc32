"""fozzie_spark — a PySpark-native record-linkage / fuzzy-join engine.

From-scratch reimplementation of the query surface of the fozziejoin R
package (reference at /root/reference) as an idiomatic Spark pipeline:
blocking (q-gram inverted index, length bands, numeric banding, interval
binning) -> vectorized pairwise scoring (Arrow-batched pandas UDFs) ->
join-mode materialization / transitive clustering (large-star/small-star
connected components), with stage checkpointing, lineage and metrics.
"""

__version__ = "0.1.0"

_JOIN_EXPORTS = (
    "fuzzy_string_join",
    "difference_join",
    "distance_join",
    "interval_join",
    "regex_join",
    "temporal_join",
    "temporal_interval_join",
)


def __getattr__(name):  # lazy: keep scorer-only imports Spark-free
    if name in _JOIN_EXPORTS or name.endswith("_join"):
        from fozzie_spark import joins

        try:
            return getattr(joins, name)
        except AttributeError:
            pass
    raise AttributeError(name)
