"""Metadata-driven cleaning ETL — SURVEY.md §3.1 as a composable library.

The reference's KNHANES pipeline (1-1.data_processing.ipynb +
1-2.labeling_XYdataset.ipynb): union years over the schema intersection,
iterate a variable-dictionary sheet generating per-variable sentinel
recodes, prune columns by null ratio, filter rows, threshold-label, split.

Spark-first shape: the metadata sheet is a TINY driver-side table; iterating
it (`df_meta.iterrows()` in the reference) becomes driver-side compilation
of Catalyst `when` chains — the big table is touched by ONE lazy DAG
(scan → select(recodes) → filter → select(kept) → label), so Catalyst
collapses the ~800-variable recode loop into a single projection. The only
extra action is the null-ratio aggregation (step 4), an inherent 2-pass:
the output schema depends on the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class VarMeta:
    """One row of the variable dictionary (0.meta_data_check.ipynb schema:
    variable name, declared type, option string like '8:모름 | 9:해당없음')."""

    name: str
    data_type: str  # 'numeric' | 'category'
    options: str = ""
    recode_nan: list[float] = field(default_factory=list)  # codes -> NULL
    recode_na: list[float] = field(default_factory=list)  # codes -> -1


def parse_option_string(options: str) -> dict[float, str]:
    """'8:모름 | 9:해당없음' -> {8.0: '모름', 9.0: '해당없음'}
    (1-1.data_processing.ipynb:1436 — split on '|' then ':')."""
    out: dict[float, str] = {}
    for part in options.split("|"):
        part = part.strip()
        if not part or ":" not in part:
            continue
        code, label = part.split(":", 1)
        try:
            out[float(code.strip())] = label.strip()
        except ValueError:
            continue
    return out


# option labels the reference maps to NULL ("don't know / no answer") vs the
# -1 "not applicable" sentinel (1-1.data_processing.ipynb:1440-1443)
_NAN_LABELS = ("모름", "무응답", "비해당아님", "unknown", "no answer")
_NA_LABELS = ("해당없음", "비해당", "not applicable")


def compile_recode(col: str, meta: VarMeta) -> Column:
    """Compile one variable's sentinel recodes into a when-chain."""
    codes = parse_option_string(meta.options)
    nan_codes = set(meta.recode_nan) | {
        c for c, lab in codes.items() if lab.lower() in _NAN_LABELS
    }
    na_codes = set(meta.recode_na) | {
        c for c, lab in codes.items() if lab.lower() in _NA_LABELS
    }
    expr: Column = F.col(col)
    for c in sorted(na_codes):
        expr = F.when(F.col(col) == F.lit(c), F.lit(-1.0)).otherwise(expr)
    for c in sorted(nan_codes):
        expr = F.when(F.col(col) == F.lit(c), F.lit(None)).otherwise(expr)
    return expr.alias(col)


def apply_recodes(df: DataFrame, metas: list[VarMeta]) -> DataFrame:
    """One projection applying every variable's compiled recode (the
    reference's per-variable replace loop, fused)."""
    by_name = {m.name: m for m in metas}
    return df.select(
        *[
            compile_recode(c, by_name[c]) if c in by_name else F.col(c)
            for c in df.columns
        ]
    )


def union_years(a: DataFrame, b: DataFrame, order_from: DataFrame | None = None) -> DataFrame:
    """Vertical union over the schema intersection, preserving one side's
    column order (1-1.data_processing.ipynb:1240-1249)."""
    order_from = order_from if order_from is not None else b
    common = [c for c in order_from.columns if c in set(a.columns) & set(b.columns)]
    return a.select(common).unionByName(b.select(common))


def null_ratio_prune(
    df: DataFrame, candidates: list[str], threshold: float = 0.8
) -> tuple[DataFrame, dict[str, float]]:
    """Drop candidate columns whose null ratio exceeds `threshold`
    (1-1.data_processing.ipynb:2485-2488). One aggregation action — the
    inherent second pass, since the surviving schema depends on the data."""
    row = df.agg(
        F.count("*").alias("__n"),
        *[
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}")
            for c in candidates
        ],
    ).collect()[0]
    n = row["__n"] or 1
    ratios = {c: row[f"__null_{c}"] / n for c in candidates}
    dropped = [c for c, r in ratios.items() if r > threshold]
    return df.drop(*dropped), ratios


def threshold_label(
    df: DataFrame, src: str, tau: float, label_col: str = "label"
) -> DataFrame:
    """Derive the binary target, then DROP the source column — the
    leakage-column removal of 1-2.labeling_XYdataset.ipynb:522-529."""
    return df.filter(F.col(src).isNotNull()).withColumn(
        label_col, (F.col(src) > tau).cast("int")
    ).drop(src)


def stratified_split(
    df: DataFrame, label_col: str, order_cols: list[str], k_test: int = 5
) -> DataFrame:
    """80/20 stratified split tag via per-class row_number % k (deterministic
    under any partitioning, unlike seeded rand — SURVEY.md §4.2)."""
    from pyspark.sql import Window

    w = Window.partitionBy(label_col).orderBy(*order_cols)
    return df.withColumn(
        "split",
        F.when(F.row_number().over(w) % k_test == 0, "test").otherwise("train"),
    )
