"""Driver-checked query registry modules.

Importing this package registers every query (side effect of the
``@query(...)`` decorators). Keep ALL_MODULES in sync as modules are added.
"""

from . import flagship  # noqa: F401

ALL_MODULES = [flagship]

for _mod_name in (
    "relational",
    "joins_unions",
    "aggregates",
    "windows_sorts",
    "scalar_funcs",
    "metrics",
    "stats_tests",
    "mlprep",
    "ensembles",
    "text_ops",
    "dedup",
    "similarity",
    "streaming_batch",
    "mlsearch",
    "mlmodels",
    "sources_extra",
    "multimodal",
    "etl",
    "behavior",
    "pipeline_ops",
    "olap_ext",
    "corpus_ops",
    "scale_ops",
    "tpch_ext",
    "tpch_ext2",
    "incremental",
    "graph_ext",
    "storage_ops",
):
    try:
        _mod = __import__(f"{__name__}.{_mod_name}", fromlist=[_mod_name])
        ALL_MODULES.append(_mod)
    except ModuleNotFoundError as e:  # module not written yet in this round
        if _mod_name not in str(e):
            raise
