"""Driver-checked query registry modules.

Importing this package registers every query (side effect of the
``@query(...)`` decorators). Keep ALL_MODULES in sync as modules are added.
"""

from . import flagship  # noqa: F401

ALL_MODULES = [flagship]

# Import order IS driver-verification order (the correctness gate samples
# queries in registration order; registry.all_queries additionally floats
# never-driver-checked keys ahead of already-green ones). Round 1 covered
# flagship/relational/joins/aggregates/windows; round 2 covered metrics/
# stats/mlprep/dedup/similarity. Round 3 leads with the LLM-pipeline
# families the north star names (text/corpus/multimodal/decontam), the
# streaming engine runs, the ANN quality contracts (similarity's unchecked
# tail), then behavior/incremental/storage. Rotate again as coverage lands.
for _mod_name in (
    "text_ops",
    "corpus_ops",
    "multimodal",
    "decontam",
    "streaming_batch",
    "similarity",
    "clustering",
    "behavior",
    "incremental",
    "storage_ops",
    "scale_ops",
    "privacy_ops",
    "graph_ext",
    "etl",
    "sources_extra",
    "ensembles",
    "mlsearch",
    "mlmodels",
    "scalar_funcs",
    "pipeline_ops",
    "olap_ext",
    "tpch_ext",
    "tpch_ext2",
    "metrics",
    "model_compare",
    "preference_ops",
    "stats_tests",
    "mlprep",
    "dedup",
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
