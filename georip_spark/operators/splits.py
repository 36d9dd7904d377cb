"""Dataset-split operators (SURVEY.md §2.9: M1/W4/W5, A11, O2/O3).

The reference splits with python RNG + index slicing
(georip/modeling/utils.py:597-729, 882-956) and resolves cross-split
duplicates by alternating which side loses (:959-1020). Those are
order-sensitive, seeded semantics — reproduced here with
deterministic hash orderings (md5 of a key) so results are identical
at any parallelism level AND reproducible by any other engine
(md5 is engine-independent, unlike xxhash64 or rand(seed) which are
Spark-specific).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shuffle_key(key: Column, seed: int = 42) -> Column:
    """Deterministic, engine-portable 'random' sort key: md5 of the
    key with the seed mixed in (reference uses random.Random(seed),
    georip/modeling/utils.py:670-672)."""
    return F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}")))


def stratified_split(
    df: DataFrame,
    class_col: str,
    key_col: str,
    train: float = 0.7,
    val: float = 0.15,
    seed: int = 42,
) -> DataFrame:
    """Per-class ratio split (M1/W5): rows ordered by seeded hash
    within each class stratum; first `train` fraction → train, next
    `val` → val, rest → test. Mirrors the reference's per-class index
    slicing (georip/modeling/utils.py:936-944) with a deterministic
    order instead of python shuffle."""
    w = Window.partitionBy(class_col).orderBy(shuffle_key(F.col(key_col), seed), key_col)
    cw = Window.partitionBy(class_col)
    frac = (F.row_number().over(w).cast("double")) / F.count("*").over(cw)
    return df.withColumn(
        "type",
        F.when(frac <= train, "train").when(frac <= train + val, "val").otherwise("test"),
    )


def alternating_dedup_pairs(
    a: DataFrame, b: DataFrame, key_col: str
) -> DataFrame:
    """W4: duplicate keys across two splits are resolved alternately —
    dup pair j (ordered by key) is removed from side A when j is odd,
    side B when even, replicating the reference's toggle
    (georip/modeling/utils.py:959-1020: `turn` flips each removal).
    Returns (key, removed_from) rows."""
    dup = (
        a.select(F.col(key_col)).distinct()
        .join(b.select(F.col(key_col)).distinct(), key_col, "inner")
    )
    w = Window.orderBy(key_col)
    j = F.row_number().over(w)
    return dup.withColumn(
        "removed_from", F.when(j % 2 == 1, "a").otherwise("b")
    )


def seeded_sample_n(
    df: DataFrame, n: int, key_col: str, seed: int = 42
) -> DataFrame:
    """A11/O3: deterministic n-row sample — seeded-hash order, then
    limit (reference: gdf.sample(n, random_state),
    georip/datasets/models/tools.py:164-170)."""
    return df.orderBy(shuffle_key(F.col(key_col), seed), key_col).limit(n)


def background_sample(
    df: DataFrame,
    is_background: Column,
    key_col: str,
    ratio: float = 5.0,
    seed: int = 42,
) -> DataFrame:
    """The reference's background-sampling contract
    (georip/datasets/utils.py:253-258): n = min(|background|,
    ratio·|truth|), seeded. Returns truth ∪ sampled background."""
    bg = df.filter(is_background)
    truth = df.filter(~is_background)
    n = int(min(bg.count(), ratio * truth.count()))
    return truth.unionByName(seeded_sample_n(bg, n, key_col, seed))
