"""Sequence packing: fill fixed token-budget training sequences.

Pre-training loaders want sequences near the context length; feeding
documents one-per-sequence wastes the budget on padding.  Packing is a
bin-packing problem — inherently sequential — so the distributed form
is the standard two-level approximation:

  1. spread documents over B buckets by key hash (stable, partition-
     invariant — same property as ``operators/sampling.py``),
  2. first-fit-decreasing WITHIN each bucket via ``applyInPandas``
     (a bucket is thousands of docs — trivially in-memory),
  3. global pack id = (bucket, local pack index).

Waste vs. exact global FFD is the tail of each bucket (≤ one partially
filled pack per bucket); with buckets sized ≥ ~1k docs the overhead is
well under 1 %.  No stage has global state, so the operator scales to
any corpus the hash can spread.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences"]

def _out_schema(id_type: str) -> str:
    # id keeps its source type — casting (e.g. a UUID string) to long
    # would null every id and break the deterministic tiebreak
    return (
        f"doc_id {id_type}, n_tokens long, bucket int, "
        "pack_index long, pack_fill long"
    )


def pack_sequences(
    docs: DataFrame,
    *,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int | None = None,
    docs_per_bucket: int = 4096,
    total_docs: int | None = None,
    bucket_col: str | None = None,
) -> DataFrame:
    """Assign each doc to a fixed-budget pack.

    Returns (doc_id, n_tokens, bucket, pack_index, pack_fill): docs
    sharing (bucket, pack_index) form one training sequence whose
    token total ``pack_fill`` ≤ ``budget`` — except docs longer than
    the budget, which become singleton packs (the caller truncates or
    re-chunks those; see ``textops.chunk_documents``).

    ``n_buckets`` defaults from a corpus-size estimate (``total_docs``
    hint skips the count scan, mirroring ``tfidf(n_docs=...)``).
    Deterministic: bucket = xxhash64(id) mod B, and FFD within a
    bucket orders by (n_tokens desc, id) — independent of input
    partitioning.

    ``bucket_col`` overrides the hash bucketing with a caller-supplied
    int column (e.g. domain/source-aware packing, or a bucketing an
    external auditor can replay); skew in a supplied bucketing is the
    caller's to manage — the hash default spreads uniformly.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    id_type = dict(docs.dtypes)[id_col]
    if bucket_col is not None:
        keyed = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            F.col(bucket_col).cast("int").alias("bucket"),
        )
    else:
        if n_buckets is None:
            n = total_docs if total_docs is not None else docs.count()
            n_buckets = max(1, n // docs_per_bucket)
        keyed = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(tokens_col).cast("long").alias("n_tokens"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
            .cast("int")
            .alias("bucket"),
        )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        if pdf["bucket"].isna().any():
            raise ValueError(
                "bucket contains NULL (NULL values in bucket_col, or a "
                "non-numeric column cast to NULL) — every doc needs a "
                "real bucket, or they all silently pack together in "
                "one phantom NULL group"
            )
        if pdf["n_tokens"].isna().any():
            raise ValueError(
                "n_tokens contains NULL — filter or impute before "
                "packing (a NULL length has no defined pack)"
            )
        if (pdf["n_tokens"] < 0).any():
            raise ValueError("n_tokens contains negative values")
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        # best-fit-decreasing via a capacity-sorted list of open packs:
        # O(n log P) per bucket, and BFD's waste bound matches FFD's
        caps: list[int] = []  # remaining capacity, ascending
        cap_pack: list[int] = []  # pack id parallel to caps
        fills: list[int] = []  # total tokens per pack id
        assign: list[int] = []
        for t in pdf["n_tokens"]:
            t = int(t)
            i = bisect.bisect_left(caps, t)  # tightest pack that fits
            if i < len(caps):
                pack = cap_pack.pop(i)
                rem = caps.pop(i) - t
            else:
                pack = len(fills)
                fills.append(0)
                rem = max(budget - t, 0)
            fills[pack] += t
            assign.append(pack)
            if rem > 0:
                # a full (or over-budget singleton) pack must CLOSE:
                # re-inserting rem=0 would let zero-token docs join an
                # over-budget pack, breaking the singleton contract
                j = bisect.bisect_left(caps, rem)
                caps.insert(j, rem)
                cap_pack.insert(j, pack)
        pdf["pack_index"] = pd.array(assign, dtype="int64")
        pdf["pack_fill"] = pd.array(
            [fills[i] for i in assign], dtype="int64"
        )
        return pdf[["doc_id", "n_tokens", "bucket", "pack_index", "pack_fill"]]

    return keyed.groupBy("bucket").applyInPandas(_pack, _out_schema(id_type))
