"""Skew-resistant (salted) equi-join.

The 100 TB failure mode for a keyed join is one hot key funneling into a
single reducer. AQE's skew-join splitting handles sort-merge spills at
runtime, but a *planned* salt is the deterministic, engine-independent fix:
fact rows of a key are spread across ``salt`` sub-keys by a deterministic
hash of a high-cardinality tiebreaker column, and the (small but not
broadcastable) build side is replicated ``salt`` ways, so the hot key's
probe stream lands on ``salt`` reducers instead of one.

Join semantics are EXACTLY those of the unsalted join (the salt is an
internal column, dropped on output) — property-tested against a plain join
and oracle-checked through ``skewjoin_user_cohorts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

_SALT = "__skew_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    tiebreaker: str | Column,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on``, salted ``salt`` ways.

    ``tiebreaker``: a fact column (or Column) with per-row variance inside a
    key — its hash picks the sub-key, keeping the salt deterministic (no
    ``rand()``: retried tasks and re-executed stages must land rows in the
    same bucket). ``dim`` must carry each join key at most once (a
    dimension); it is exploded ``salt`` ways, so its replicated size is
    ``salt * |dim|`` — use only when the dim is too big (or too skew-prone)
    to broadcast outright.
    """
    keys = [on] if isinstance(on, str) else list(on)
    tb = F.col(tiebreaker) if isinstance(tiebreaker, str) else tiebreaker
    f = fact.withColumn(_SALT, F.pmod(F.hash(tb), F.lit(salt)))
    d = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    # shuffle_hash: the point of salting is to spread the SHUFFLE; letting
    # the optimizer broadcast the replicated dim would erase the demo and
    # at real scale the dim is above the broadcast threshold anyway.
    return f.join(d.hint("shuffle_hash"), keys + [_SALT], how).drop(_SALT)
