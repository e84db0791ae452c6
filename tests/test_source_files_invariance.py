"""Per-row invariant from BASELINE.json input_hint: sha256(content) computed
by the engine equals the generator-recorded value, and the source_files ->
person-field derivation is linkable."""

from pyspark.sql import functions as F

from name_matching_spark.datagen import source_files
from name_matching_spark.operators.normalize import LinkageSchema
from name_matching_spark.plans.linkage import dedup_table


def test_content_sha256_invariance(spark):
    pdf = source_files(n_repos=40, files_per_repo=2, seed=9)
    df = spark.createDataFrame(pdf)
    mismatches = df.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
    assert mismatches == 0


def test_repo_table_linkage(spark):
    """The SURVEY §7.0 adaptation: repo owner -> first_name, repo name +
    path stem -> middle+last; duplicate owners (typo variants) must match."""
    pdf = source_files(n_repos=60, files_per_repo=1, dup_rate=0.5, seed=4)
    df = spark.createDataFrame(pdf)
    person = df.select(
        F.concat_ws("|", "repo", "path").alias("record_id"),
        F.split_part(F.col("repo"), F.lit("/"), F.lit(1)).alias("first_name"),
        # path stem first (middle-name noise), repo words last: the
        # surname-analog must be stable across a repo's files/variants so
        # phonetic blocking brings them together
        F.concat_ws(
            " ",
            F.regexp_extract(F.col("path"), r"([A-Za-z]+)_\d", 1),
            F.regexp_replace(F.split_part(F.col("repo"), F.lit("/"), F.lit(2)), "-", " "),
        ).alias("middle_name_last_name"),
        F.col("lang").alias("province_name"),
        F.col("entity_id"),
    )
    from name_matching_spark.operators.score_pairs import MatcherConfig

    schema = LinkageSchema(
        id_col="record_id", birthdate=None, geo_fields=["province_name"]
    )
    cfg = MatcherConfig(
        use_birthdate=False,
        geo_fields=["province_name"],
        additional_weights={"geography": 0.3},
    )
    out = dedup_table(person.drop("entity_id"), schema, matcher=cfg).toPandas()
    assert len(out) > 0
    # every typo-duplicated entity should produce at least one match/review
    ent = person.select("record_id", "entity_id").toPandas().set_index("record_id")["entity_id"]
    dup_entities = ent.value_counts()
    dup_entities = set(dup_entities[dup_entities > 1].index)
    found = {
        ent[r.id1]
        for r in out.itertuples()
        if ent[r.id1] == ent[r.id2]
    }
    assert len(found) >= len(dup_entities) * 0.9
