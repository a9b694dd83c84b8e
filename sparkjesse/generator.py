"""Deterministic synthetic interleaved-docs tables (FIXTURES.md §3).

The north-star input (`BASELINE.json` input_hint) is
``documents_interleaved(doc_id string, spans array<struct<kind,text,
media_ref,offset>>)`` plus a ``media_assets`` reference table. Generation
is **pure Spark expressions** seeded by ``xxhash64`` — no Python per row,
no driver-side data, so the same generator that makes 1k test rows makes
10^12 rows on a cluster (``spark.range`` parallelizes the id space).

Injected data-quality features (all deterministic in ``seed``):
  * ~0.1% duplicate doc_ids + a small set of *hot* doc_ids (~2% of rows)
    to exercise skew-aware repartitioning;
  * ~1% dangling media_refs (ids beyond the asset table) for the
    referential check;
  * 1–8 spans per doc; kind ∈ {text, image, audio, video} (70% text);
    text spans carry text and null media_ref, media spans the reverse;
    offsets strictly increasing so span order is checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KINDS = ["text", "image", "audio", "video"]
_WORDS = ["lorem", "ipsum", "dolor", "sit", "amet", "consectetur",
          "adipiscing", "elit", "sed", "do", "eiusmod", "tempor",
          "incididunt", "ut", "labore", "et", "dolore", "magna", "aliqua"]


def _h(seed: int, *cols) -> F.Column:
    """Deterministic 64-bit hash stream."""
    return F.xxhash64(F.lit(seed), *cols)


def interleaved_documents(spark: SparkSession, n_docs: int, *,
                          seed: int = 42, n_assets: int | None = None,
                          dangling_rate: float = 0.01,
                          dup_rate: float = 0.001,
                          hot_rate: float = 0.02,
                          partitions: int | None = None) -> DataFrame:
    if n_assets is None:
        n_assets = max(10, n_docs // 4)
    base = spark.range(0, n_docs, 1, partitions) if partitions \
        else spark.range(n_docs)
    i = F.col("id")
    h0 = _h(seed, i)

    # doc_id: mostly unique; dup_rate collide with neighbor; hot_rate land
    # on 8 hot keys (skew for the repartitioner to handle)
    r = F.pmod(h0, F.lit(100000))
    doc_index = (
        F.when(r < F.lit(int(hot_rate * 100000)), F.pmod(h0, F.lit(8)))
        .when(r < F.lit(int((hot_rate + dup_rate) * 100000)),
              F.greatest(i - 1, F.lit(0)))
        .otherwise(i)
    )
    doc_id = F.concat(F.lit("d"), doc_index.cast("string"))

    n_spans = (F.pmod(_h(seed + 1, i), F.lit(8)) + 1).cast("int")

    def span(j: F.Column) -> F.Column:
        hj = _h(seed + 2, i, j)
        kind_sel = F.pmod(hj, F.lit(10))
        kind = (F.when(kind_sel < 7, F.lit("text"))
                .when(kind_sel == 7, F.lit("image"))
                .when(kind_sel == 8, F.lit("audio"))
                .otherwise(F.lit("video")))
        words = F.array(*[F.lit(w) for w in _WORDS])
        n_words = (F.pmod(_h(seed + 3, i, j), F.lit(12)) + 1).cast("int")
        text = F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda k: F.element_at(
                    words, (F.pmod(_h(seed + 4, i, j, k),
                                   F.lit(len(_WORDS))) + 1).cast("int"))),
            " ")
        asset_space = int(n_assets * (1 + dangling_rate))
        media_ref = F.concat(
            F.lit("m"), F.pmod(_h(seed + 5, i, j),
                               F.lit(asset_space)).cast("string"))
        offset = (j * 100 + F.pmod(hj, F.lit(100))).cast("int")
        is_text = kind == "text"
        return F.struct(
            kind.alias("kind"),
            F.when(is_text, text).alias("text"),
            F.when(~is_text, media_ref).alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1),
                        lambda j: span(j.cast("long")))
    return base.select(doc_id.alias("doc_id"), spans.alias("spans"))


def media_assets(spark: SparkSession, n_assets: int, *,
                 seed: int = 42) -> DataFrame:
    base = spark.range(n_assets)
    i = F.col("id")
    kind_sel = F.pmod(_h(seed + 10, i), F.lit(3))
    kind = (F.when(kind_sel == 0, F.lit("image"))
            .when(kind_sel == 1, F.lit("audio"))
            .otherwise(F.lit("video")))
    size = (F.pmod(_h(seed + 11, i), F.lit(10_000_000)) + 1000)
    return base.select(
        F.concat(F.lit("m"), i.cast("string")).alias("media_ref"),
        kind.alias("media_kind"),
        size.alias("bytes"),
    )


# the constraint set used for benchmarks and the flagship entry — the
# "full draft4 constraint set" over the interleaved table
INTERLEAVED_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {"type": "string", "pattern": "^d[0-9]+$",
                   "minLength": 2, "maxLength": 24},
        "spans": {
            "type": "array",
            "minItems": 1,
            "maxItems": 64,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"type": "string",
                             "enum": ["text", "image", "audio", "video"]},
                    "text": {"type": "string", "maxLength": 4096},
                    "media_ref": {"type": "string",
                                  "pattern": "^m[0-9]+$"},
                    "offset": {"type": "integer", "minimum": 0,
                               "maximum": 1000000},
                },
            },
        },
    },
}
