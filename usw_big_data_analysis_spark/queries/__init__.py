"""Driver-checked query registry modules.

Importing this package registers every query (side effect of the
``@query(...)`` decorators). Keep ALL_MODULES in sync as modules are added.
"""

from . import flagship  # noqa: F401

ALL_MODULES = [flagship]

# Import order IS driver-verification order (the correctness gate samples
# queries in registration order). Round 1's gate covered the first 50 keys —
# flagship/relational/joins_unions/aggregates/windows_sorts — so round 2
# rotates the never-verified families to the front: metrics, stats_tests,
# mlprep, the LLM-pipeline layer (dedup/similarity/text/multimodal), and the
# streaming twins. Already-green families move to the back; rotate again as
# coverage lands.
for _mod_name in (
    "metrics",
    "stats_tests",
    "mlprep",
    "dedup",
    "similarity",
    "text_ops",
    "decontam",
    "multimodal",
    "streaming_batch",
    "scalar_funcs",
    "ensembles",
    "mlsearch",
    "mlmodels",
    "sources_extra",
    "corpus_ops",
    "pipeline_ops",
    "olap_ext",
    "tpch_ext2",
    "behavior",
    "etl",
    "storage_ops",
    "incremental",
    "graph_ext",
    "scale_ops",
    "tpch_ext",
    "relational",
    "joins_unions",
    "aggregates",
    "windows_sorts",
):
    try:
        _mod = __import__(f"{__name__}.{_mod_name}", fromlist=[_mod_name])
        ALL_MODULES.append(_mod)
    except ModuleNotFoundError as e:  # module not written yet in this round
        if _mod_name not in str(e):
            raise
