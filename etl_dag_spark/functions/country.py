"""Country-name → ISO alpha-3 normalization.

Mirrors the reference's ``transform_country`` (ETL_DAG.py:144-151), which
calls ``pycountry.countries.search_fuzzy`` per row — a per-row Python
call that would be catastrophic at scale. Here the mapping is a static
lookup applied as a JVM-side literal-map expression (or a broadcast join
for very large reference tables): zero Python in the hot path, and
unrecognized names yield NULL exactly like the reference's
``LookupError → None`` branch.

The same Python dict emits the DuckDB oracle fragment
(``iso3_sql_case``), so the Spark plan and the correctness oracle can
never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Canonical TPC-H nation list in nationkey order (dbgen's fixed 25
# nations); the harness test data uses synthetic names NATION_<k>, which
# map positionally onto the same list.
_TPCH_NATIONS = [
    ("ALGERIA", "DZA"),
    ("ARGENTINA", "ARG"),
    ("BRAZIL", "BRA"),
    ("CANADA", "CAN"),
    ("EGYPT", "EGY"),
    ("ETHIOPIA", "ETH"),
    ("FRANCE", "FRA"),
    ("GERMANY", "DEU"),
    ("INDIA", "IND"),
    ("INDONESIA", "IDN"),
    ("IRAN", "IRN"),
    ("IRAQ", "IRQ"),
    ("JAPAN", "JPN"),
    ("JORDAN", "JOR"),
    ("KENYA", "KEN"),
    ("MOROCCO", "MAR"),
    ("MOZAMBIQUE", "MOZ"),
    ("PERU", "PER"),
    ("CHINA", "CHN"),
    ("ROMANIA", "ROU"),
    ("SAUDI ARABIA", "SAU"),
    ("VIETNAM", "VNM"),
    ("RUSSIA", "RUS"),
    ("UNITED KINGDOM", "GBR"),
    ("UNITED STATES", "USA"),
]

# Aliases covering the fuzzy-lookup behavior the reference relied on.
_ALIASES = {
    "USA": "USA",
    "US": "USA",
    "U.S.A.": "USA",
    "UNITED STATES OF AMERICA": "USA",
    "UK": "GBR",
    "GREAT BRITAIN": "GBR",
    "ENGLAND": "GBR",
    "SOUTH KOREA": "KOR",
    "KOREA": "KOR",
    "MEXICO": "MEX",
    "SPAIN": "ESP",
    "ITALY": "ITA",
    "NETHERLANDS": "NLD",
    "HOLLAND": "NLD",
    "COLOMBIA": "COL",
    "CHILE": "CHL",
    "AUSTRALIA": "AUS",
    "SWITZERLAND": "CHE",
    "SWEDEN": "SWE",
    "TURKEY": "TUR",
    "VIET NAM": "VNM",
    "RUSSIAN FEDERATION": "RUS",
}

COUNTRY_TO_ISO3: dict[str, str] = {
    **{name: iso3 for name, iso3 in _TPCH_NATIONS},
    **{f"NATION_{k}": iso3 for k, (_, iso3) in enumerate(_TPCH_NATIONS)},
    **_ALIASES,
}


def iso3_column(col: Column | str) -> Column:
    """ISO alpha-3 for a country-name column; NULL when unrecognized.

    Literal-map lookup — evaluated entirely in the JVM inside
    whole-stage codegen. Input is normalized with upper(trim()).
    """
    col = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for name, iso3 in COUNTRY_TO_ISO3.items():
        pairs.append(F.lit(name))
        pairs.append(F.lit(iso3))
    return F.create_map(*pairs)[F.upper(F.trim(col))]


def with_iso3(df: DataFrame, src_col: str, out_col: str = "country_iso3") -> DataFrame:
    """Broadcast-join variant for when the mapping is a real reference
    table (thousands of aliases) rather than a literal: the lookup side
    is broadcast so the fact side never shuffles."""
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        [(k, v) for k, v in COUNTRY_TO_ISO3.items()], ["__name", "__iso3"]
    )
    joined = df.join(
        F.broadcast(mapping),
        F.upper(F.trim(F.col(src_col))) == F.col("__name"),
        "left",
    )
    return joined.withColumnRenamed("__iso3", out_col).drop("__name")


def iso3_sql_case(col_expr: str) -> str:
    """DuckDB CASE expression equivalent to :func:`iso3_column`,
    generated from the same dict so oracle and plan cannot diverge."""
    whens = "\n".join(
        f"WHEN '{name}' THEN '{iso3}'" for name, iso3 in COUNTRY_TO_ISO3.items()
    )
    return f"(CASE upper(trim({col_expr}))\n{whens}\nELSE NULL END)"


def fuzzy_iso3_frame(df: DataFrame, src_col: str, max_distance: int = 3) -> DataFrame:
    """Fuzzy country resolution — the scalable twin of the reference's
    per-row ``pycountry.countries.search_fuzzy`` (ETL_DAG.py:144-151):
    names that miss the exact alias map match the nearest dictionary
    entry by Levenshtein distance ≤ ``max_distance`` (ties break to the
    alphabetically-first candidate). Distances are computed per DISTINCT
    unmatched name (not per row) against the broadcast dictionary, then
    joined back — at scale the distinct-name set is tiny relative to
    the fact table.

    → input columns + (country_iso3, match_kind ∈ exact|fuzzy|none)
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F  # noqa: PLC0415 (local twin import)

    norm = F.upper(F.trim(F.col(src_col)))
    tagged = df.withColumn("__exact", iso3_column(src_col)).withColumn("__name", norm)
    spark = df.sparkSession
    mapping = spark.createDataFrame(
        sorted(COUNTRY_TO_ISO3.items()), ["__cand", "__cand_iso3"]
    )
    names = (
        tagged.where(F.col("__exact").isNull() & F.col("__name").isNotNull())
        .select("__name")
        .distinct()
    )
    scored = (
        names.join(F.broadcast(mapping))
        .withColumn("__dist", F.levenshtein(F.col("__name"), F.col("__cand")))
        .where(F.col("__dist") <= max_distance)
    )
    w = Window.partitionBy("__name").orderBy("__dist", "__cand")
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("__name", F.col("__cand_iso3").alias("__fuzzy"))
    )
    out = tagged.join(F.broadcast(best), on="__name", how="left")
    return out.select(
        *df.columns,
        F.coalesce(F.col("__exact"), F.col("__fuzzy")).alias("country_iso3"),
        F.when(F.col("__exact").isNotNull(), F.lit("exact"))
        .when(F.col("__fuzzy").isNotNull(), F.lit("fuzzy"))
        .otherwise(F.lit("none"))
        .alias("match_kind"),
    )
