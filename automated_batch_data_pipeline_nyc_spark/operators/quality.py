"""Data-quality gates (SURVEY.md §2.10 O3/O4).

The reference enforces quality with two SQL assertions that fail the
Airflow task (dags/nyc_taxi_pipeline_dag.py:184-202): COUNT(*) > 0 and
zero NULLs in key fields.  Here they are reusable gate stages that
raise ``QualityGateError`` — the driver-level equivalent of a failed
task halting downstream stages.

Scale note: both gates are single aggregations; ``expect_no_nulls``
folds all key columns into ONE pass (a single conditional-count
aggregate) instead of one count() job per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "QualityGateError",
    "expect_nonempty",
    "expect_no_nulls",
    "expect",
    "expect_unique_key",
    "expect_values_between",
    "expect_referential_integrity",
    "null_matrix",
    "k_anonymity_audit",
    "k_anonymity_summary",
    "l_diversity_audit",
    "l_diversity_summary",
    "profile_table",
    "benford_audit",
    "population_stability_index",
    "dp_noisy_counts",
    "diff_in_diff",
]


class QualityGateError(AssertionError):
    """A quality gate failed; the pipeline run must halt (O3/O4)."""


def expect_nonempty(df: DataFrame, name: str = "dataset") -> DataFrame:
    """O3: raise if COUNT(*) == 0 (dags/nyc_taxi_pipeline_dag.py:188-192)."""
    # limit(1) probe: at 100 TB we don't need the exact count to know
    # the table is non-empty.
    if not df.take(1):
        raise QualityGateError(f"{name}: row count is 0")
    return df


def expect_no_nulls(df: DataFrame, key_columns: Sequence[str], name: str = "dataset") -> DataFrame:
    """O4: raise if any key column is NULL in any row
    (dags/nyc_taxi_pipeline_dag.py:194-202)."""
    pred = None
    for c in key_columns:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    bad = df.filter(pred).count()
    if bad:
        raise QualityGateError(f"{name}: {bad} rows with NULL in {list(key_columns)}")
    return df


def expect(df: DataFrame, predicate: Column, name: str = "expectation") -> DataFrame:
    """Generic gate: every row must satisfy *predicate*."""
    bad = df.filter(~predicate).count()
    if bad:
        raise QualityGateError(f"{name}: {bad} rows violate predicate")
    return df


def expect_unique_key(
    df: DataFrame, key_columns: Sequence[str], name: str = "dataset"
) -> DataFrame:
    """Gate: *key_columns* must be a unique key.  One groupBy shuffle;
    the HAVING-style filter keeps only violating groups so the driver
    sees at most a tiny result."""
    dupes = (
        df.groupBy(*key_columns)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
    )
    sample = dupes.take(3)
    if sample:
        keys = [tuple(r[c] for c in key_columns) for r in sample]
        raise QualityGateError(f"{name}: duplicate keys on {list(key_columns)}, e.g. {keys}")
    return df


def expect_values_between(
    df: DataFrame,
    column: str,
    lo,
    hi,
    name: str = "dataset",
    allow_null: bool = True,
) -> DataFrame:
    """Gate: every (non-null unless ``allow_null=False``) value of
    *column* must lie in [lo, hi].  Single conditional-count pass."""
    viol = ~F.col(column).between(lo, hi)
    if allow_null:
        viol = viol & F.col(column).isNotNull()
    else:
        viol = viol | F.col(column).isNull()
    bad = df.filter(viol).count()
    if bad:
        raise QualityGateError(f"{name}: {bad} rows with {column} outside [{lo}, {hi}]")
    return df


def expect_referential_integrity(
    df: DataFrame,
    fk_column: str,
    dim: DataFrame,
    pk_column: str,
    name: str = "dataset",
) -> DataFrame:
    """Gate: every non-null fk value must exist in the dimension — a
    left-anti join (orphans only reach the driver).  At scale the dim
    side broadcasts when small, exactly like the enrich join it guards."""
    orphans = (
        df.filter(F.col(fk_column).isNotNull())
        .join(dim.select(F.col(pk_column).alias(fk_column)), fk_column, "left_anti")
    )
    n = orphans.count()
    if n:
        raise QualityGateError(
            f"{name}: {n} rows whose {fk_column} has no match in dimension {pk_column}"
        )
    return df


def null_matrix(df: DataFrame) -> DataFrame:
    """A3: per-column NULL counts in one aggregation pass — the
    distributed version of ``chunk.isnull().sum()``
    (dags/nyc_taxi_pipeline_dag.py:95-96)."""
    aggs = [
        F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}")
        for c in df.columns
    ]
    return df.agg(*aggs)


def k_anonymity_audit(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """k-anonymity risk surface (Sweeney 2002): the quasi-identifier
    combinations shared by FEWER than ``k`` rows — each is a
    re-identification risk (someone knowing just those attributes can
    narrow a released record to < k candidates).  The audit every
    privacy review runs before publishing a derived dataset; the
    standard remediations are generalizing a quasi-column (coarser
    buckets) or suppressing the risky groups.

    Returns ``(*quasi_cols, n)`` with ``n < k``.  One map-side-
    combinable count shuffle keyed on the quasi columns; output is
    bounded by the risky-group count, not the corpus.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (k=1 is vacuous); got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < k)
    )


def k_anonymity_summary(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One-row k-anonymity census over a quasi-identifier set:
    group count, risky-group count (< k members), rows at risk, and
    the minimum group size (the dataset's effective k).  Same single
    count shuffle as the audit, then a group-table-sized fold."""
    if k < 2:
        raise ValueError(f"k must be >= 2 (k=1 is vacuous); got {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n"))
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n") < k, 1).otherwise(0)).cast("long").alias(
            "n_risky_groups"
        ),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)).cast("long").alias(
            "n_rows_at_risk"
        ),
        F.min("n").alias("effective_k"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity risk surface (Machanavajjhala et al. 2007) — the
    audit k-anonymity misses: a quasi-identifier group can have >= k
    members yet leak the SENSITIVE attribute outright when every member
    shares one value (the homogeneity attack).  Flags the groups whose
    sensitive column takes FEWER than ``l`` distinct non-null values.

    Returns ``(*quasi_cols, n, n_sensitive)`` with ``n_sensitive < l``.
    One shuffle keyed on the quasi columns; the exact per-group
    COUNT(DISTINCT sensitive) plans a single Expand (2 rows per input),
    still map-side-combinable — no second job, no join.  Output is
    bounded by the risky-group count, not the corpus.
    """
    if l < 2:
        raise ValueError(f"l must be >= 2 (l=1 is vacuous); got {l}")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def l_diversity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """One-row l-diversity census over a quasi-identifier set against a
    sensitive column: group count, homogeneity-risk group count
    (< ``l`` distinct sensitive values), rows sitting in them, and the
    minimum per-group diversity (the dataset's effective l).  Same
    single grouped distinct-count pass as the audit, then a group-
    table-sized fold — the privacy-review companion to
    :func:`k_anonymity_summary`."""
    if l < 2:
        raise ValueError(f"l must be >= 2 (l=1 is vacuous); got {l}")
    groups = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    )
    risky = F.col("n_sensitive") < l
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(risky.cast("long")).alias("n_homogeneous_groups"),
        F.sum(F.when(risky, F.col("n")).otherwise(0)).cast("long").alias(
            "n_rows_at_risk"
        ),
        F.min("n_sensitive").alias("effective_l"),
    )


def profile_table(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """One-pass table profile — the ANALYZE-TABLE / data-catalog
    primitive: per column ``(column, n_rows, n_nulls, n_distinct,
    min_value, max_value)``, computed in a SINGLE aggregate over one
    scan (never a job per column).

    ``min_value``/``max_value`` serialize through CAST AS STRING so one
    schema fits every column type; cast raw DOUBLE columns to DECIMAL
    first when the profile must be engine-portable (float-to-string
    formatting differs across engines; decimal/date/int renderings do
    not).  With ``approx_distinct`` the NDV uses HyperLogLog —
    the 100 TB default: exact COUNT(DISTINCT) per column plans an
    Expand (one input row fans out per distinct-aggregate), which is
    one shuffle but columns× the map output; the sketch keeps the scan
    map-only.  Complex columns (array/map/struct) profile counts and
    nulls; min/max/NDV are NULL for them.

    Plan shape (r13, guide §2): min/max whose AGGREGATE BUFFER is not a
    mutable primitive (strings, wide decimals) are split into a second,
    Expand-free aggregate and re-attached with a 1x1 cross join.
    HashAggregate supports only mutable fixed-width buffers; one
    min(string) in the main aggregate demotes the WHOLE multi-distinct
    plan to SortAggregate — measured at sf0.1 on orders as three extra
    Sorts of the 7x-Expanded frame (the dominant cost of the query).
    With the split, the Expand path hash-aggregates, and the string
    min/max pass is a no-keys partial+final over the raw scan.
    """
    simple = {
        f.name: f.dataType.typeName()
        not in ("array", "map", "struct", "binary")
        for f in df.schema.fields
    }
    # buffer mutability rule (HashAggregateExec.supportsAggregate):
    # fixed-width atomic types only; DECIMAL stays long-backed through
    # precision 18
    def _hash_friendly(dt) -> bool:
        t = dt.typeName()
        if t == "string":
            return False
        if t == "decimal":
            return dt.precision <= 18
        return True

    types = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    slow_aggs: list[Column] = []
    for name, ok in simple.items():
        c = F.col(name)
        aggs.append(F.count(c).alias(f"__nn_{name}"))
        if ok:
            aggs.append(
                (
                    F.approx_count_distinct(c)
                    if approx_distinct
                    else F.countDistinct(c)
                ).alias(f"__nd_{name}")
            )
            target = aggs if _hash_friendly(types[name]) else slow_aggs
            target.append(F.min(c).cast("string").alias(f"__mn_{name}"))
            target.append(F.max(c).cast("string").alias(f"__mx_{name}"))
    row = df.agg(*aggs)
    if slow_aggs:
        # 1-row x 1-row attach: BroadcastNestedLoopJoin of two scalar
        # aggregates (the audit's whitelisted product shape)
        row = row.crossJoin(df.agg(*slow_aggs))
    cols = F.array(
        *[
            F.struct(
                F.lit(name).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{name}")).alias("n_nulls"),
                (
                    F.col(f"__nd_{name}")
                    if ok
                    else F.lit(None).cast("long")
                ).alias("n_distinct"),
                (
                    F.col(f"__mn_{name}")
                    if ok
                    else F.lit(None).cast("string")
                ).alias("min_value"),
                (
                    F.col(f"__mx_{name}")
                    if ok
                    else F.lit(None).cast("string")
                ).alias("max_value"),
            )
            for name, ok in simple.items()
        ]
    )
    return row.select(F.explode(cols).alias("p")).select("p.*")


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-significant-digit audit over a positive numeric
    column — the fraud / fabrication / unit-mixing screen an accounting
    or data-quality review runs on amount columns: naturally-occurring
    multiplicative data puts digit d first with probability
    ``log10(1 + 1/d)``; capped, fabricated, or unit-mixed data does not.

    Per digit 1-9: exact observed count, observed share, the Benford
    expected share, and the chi-square contribution
    ``(O_d − n·e_d)² / (n·e_d)``, plus the dataset-wide ``chi2_total``
    and ``n_total`` repeated on every row (digit-level detail and the
    headline statistic in one frame).

    Cross-engine exactness: the first digit comes from the DECIMAL
    string render (``substr(cast(x as decimal) as string, 1, 1)``) —
    no ``log``/``pow`` anywhere near the corpus scan, so the hot path
    is pure integer/string codegen.  ``log10`` appears only in the
    9-row tail and rounds at 6 dp (libm ULP is engine-dependent); the
    chi terms are then fixed IEEE ops over identical doubles, and the
    total sums their 6-dp-rounded values in DECIMAL so partial order
    can't change the result.  Rows with ``value < 1`` or NULL are
    excluded (their leading character is not a significant digit).

    Plan shape: ONE map-side-combined count shuffle (≤ 9 rows out),
    a broadcast join against a literal digit table so absent digits
    surface as zero counts, then window sums over the 9-row frame
    (bounded by construction — never the corpus).
    """
    from pyspark.sql import Window

    c = F.col(value_col)
    counts = (
        df.filter(c.isNotNull() & (c >= 1))
        .groupBy(
            F.substring(c.cast("decimal(18,2)").cast("string"), 1, 1)
            .cast("long")
            .alias("digit")
        )
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    digits = df.sparkSession.range(1, 10).select(F.col("id").alias("digit"))
    j = digits.join(F.broadcast(counts), "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    wall = Window.partitionBy()  # 9 rows — bounded by construction
    t = j.select(
        "digit", "n_obs", F.sum("n_obs").over(wall).alias("n_total")
    )
    n = F.col("n_total").cast("double")
    o = F.col("n_obs").cast("double")
    exp = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6)
    term = F.round(((o - n * exp) * (o - n * exp)) / (n * exp), 6)
    scored = t.select(
        "digit",
        "n_obs",
        "n_total",
        (o / n).alias("obs_share"),
        exp.alias("exp_share"),
        term.alias("chi_term"),
    )
    return scored.select(
        "digit",
        "n_obs",
        "n_total",
        "obs_share",
        "exp_share",
        "chi_term",
        F.sum(F.col("chi_term").cast("decimal(28,6)"))
        .over(wall)
        .cast("double")
        .alias("chi2_total"),
    )


def population_stability_index(
    expected: DataFrame,
    actual: DataFrame,
    value_col: str,
    edges: Sequence[float],
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index — the data-drift monitor run between a
    baseline window ("expected": training data, last month) and a new
    window ("actual": serving data, this month).

    The value range is cut at the fixed ``edges`` into ``len(edges)+1``
    bins (bin 0: x < edges[0]; bin i: edges[i-1] <= x < edges[i]; last
    bin: x >= edges[-1]; NULLs are excluded).  Per bin:

      ``psi_term = (p_actual − p_expected) · ln(p_actual / p_expected)``

    with both shares Laplace-smoothed ``(n_b + α)/(N + α·k)`` so empty
    bins stay finite.  Σ psi_term is the headline PSI (< 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted — the industry rule of thumb).

    Plan shape: each side is ONE map-side-combined count aggregate whose
    output is k rows (the bin CASE is a scan-level expression — the
    corpora are never joined or shuffled row-wise), then two k-row
    broadcast joins against a literal bin table so every bin appears
    even when both sides are empty.  Scales with the two scans at any
    data size.  ``psi_term`` rounds at 6 dp; counts and the single
    IEEE divisions replay exactly in ANSI SQL.
    """
    if list(edges) != sorted(float(e) for e in edges) or len(edges) < 1:
        raise ValueError("edges must be a non-empty ascending sequence")
    k = len(edges) + 1

    def _bin(c: Column) -> Column:
        out: Column = F.lit(k - 1)
        for i in range(len(edges) - 1, -1, -1):
            out = F.when(c < F.lit(float(edges[i])), F.lit(i)).otherwise(out)
        return out

    def _side(df: DataFrame, alias: str) -> DataFrame:
        c = F.col(value_col).cast("double")
        return (
            df.filter(c.isNotNull())
            .groupBy(_bin(c).cast("long").alias("bin_id"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    bins = expected.sparkSession.range(k).select(F.col("id").alias("bin_id"))
    e = _side(expected, "n_expected")
    a = _side(actual, "n_actual")
    joined = (
        bins.join(F.broadcast(e), "bin_id", "left")
        .join(F.broadcast(a), "bin_id", "left")
        .select(
            "bin_id",
            F.coalesce("n_expected", F.lit(0)).alias("n_expected"),
            F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
        )
    )
    # totals via an unbounded window over the k-row bin table — a
    # separate .agg + crossJoin would make Catalyst re-plan (and
    # re-scan) both corpus subtrees once per reference
    from pyspark.sql import Window

    wall = Window.partitionBy()  # k rows — bounded by construction
    tot = joined.select(
        "bin_id",
        "n_expected",
        "n_actual",
        F.sum("n_expected").over(wall).alias("__te"),
        F.sum("n_actual").over(wall).alias("__ta"),
    )
    pe = (F.col("n_expected").cast("double") + F.lit(alpha)) / (
        F.col("__te").cast("double") + F.lit(alpha * k)
    )
    pa = (F.col("n_actual").cast("double") + F.lit(alpha)) / (
        F.col("__ta").cast("double") + F.lit(alpha * k)
    )
    return tot.select(
        "bin_id",
        "n_expected",
        "n_actual",
        F.round(pe, 6).alias("p_expected"),
        F.round(pa, 6).alias("p_actual"),
        F.round((pa - pe) * F.log(pa / pe), 6).alias("psi_term"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism
    — ``(group, true_count, noise6, noisy_count6)``.

    A COUNT has L1 sensitivity 1 (one individual changes it by at most
    1), so adding Laplace(1/ε) noise satisfies ε-DP — the standard
    private-release primitive for sharing aggregate statistics over
    user data (completes the privacy battery beside
    :func:`k_anonymity_audit` / :func:`l_diversity_audit`).

    The draw is DETERMINISTIC-per-(seed, group): inverse-CDF Laplace
    on the engine-portable md5 uniform,
    ``noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|)``, so releases are
    reproducible, auditable in ANSI SQL, and identical across reruns
    and engines — the same replayability contract as every sampler
    here.  NOTE: a reproducible draw means re-releasing with the same
    seed spends no extra privacy budget, but *changing* the seed does;
    and a real release must DROP ``true_count`` (kept here so pipelines
    can audit the mechanism, e.g. calibrate expected |noise|).

    Plan: one map-side-combinable count shuffle; the noise expression
    is per-GROUP (group-cardinality rows), pure JVM math.
    """
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0; got {epsilon}")
    counts = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "\x1f", F.lit(str(seed)), F.col(group_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint").cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        group_col,
        "true_count",
        F.round(noise, 6).alias("noise6"),
        F.round(F.col("true_count").cast("double") + noise, 6).alias(
            "noisy_count6"
        ),
    )


def diff_in_diff(
    df: DataFrame,
    treated: Column,
    post: Column,
    value_col: str,
) -> DataFrame:
    """Difference-in-differences point estimate — ONE row with the four
    cell means and ``did6 = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)``.

    The workhorse quasi-experimental estimator when treatment wasn't
    randomized (a feature shipped to one region, a policy applied to
    one cohort): the control group's pre→post drift nets out shared
    time trends, leaving the treatment effect under the
    parallel-trends assumption.

    Plan: ONE map-side-combinable aggregate — each row contributes to
    exactly one of four (treated, post) cells via conditional sums;
    no join, no window, nothing grows with the corpus.  Cell sums are
    exact DECIMAL; each mean and the DiD combination is one fixed IEEE
    expression rounded 6dp (cross-engine bit-stable).
    """
    x = F.col(value_col).cast("decimal(18,2)")
    t = treated.cast("boolean")
    p = post.cast("boolean")

    def cell(tt: bool, pp: bool, tag: str) -> list[Column]:
        cond = (t == F.lit(tt)) & (p == F.lit(pp))
        return [
            F.sum(F.when(cond, x)).alias(f"__s_{tag}"),
            F.count(F.when(cond, F.lit(1))).alias(f"__n_{tag}"),
        ]

    agg = df.filter(x.isNotNull() & t.isNotNull() & p.isNotNull()).agg(
        *cell(True, False, "t_pre"),
        *cell(True, True, "t_post"),
        *cell(False, False, "c_pre"),
        *cell(False, True, "c_post"),
    )

    def mean(tag: str) -> Column:
        return F.col(f"__s_{tag}").cast("double") / F.col(
            f"__n_{tag}"
        ).cast("double")

    did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    return agg.select(
        *[F.col(f"__n_{g}").alias(f"n_{g}") for g in
          ("t_pre", "t_post", "c_pre", "c_post")],
        *[F.round(mean(g), 6).alias(f"mean_{g}6") for g in
          ("t_pre", "t_post", "c_pre", "c_post")],
        F.round(did, 6).alias("did6"),
    )
