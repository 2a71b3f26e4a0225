"""Approximate neighborhood function / effective diameter (ANF — Palmer,
Gibbons & Faloutsos, KDD'02; the HyperBall ancestor used for the classic
web-graph "effective diameter ~ 16" measurements).

N(h) = Σ_v |ball(v, h)| estimated with R Flajolet-Martin bitmask sketches
per node: node v seeds bit ``tz(md5(v # r))`` in sketch r (tz = trailing
zeros — geometric, P(pos=k) = 2^-(k+1)); one propagation round ORs every
node's sketches with its out-neighbors', so after h rounds sketch r of v
covers exactly ball(v, h). |ball| is read back as 2^b / 0.77351 with b =
the lowest zero bit position averaged over the R sketches.

All randomness is md5-derived and every per-round state is 64-bit integer
bitmasks, so a SQL engine with md5/bit_count (DuckDB) replays the exact
trajectory — the gate compares the INTEGER per-h sum of bit positions,
sidestepping float-sum ordering entirely.

Scale: state is |V| rows × R longs; a round is one |E|-row join + bit_or
hash agg (map-side combinable) + a left join back — the PageRank scatter/
gather shape with OR for +. R and the 40-bit position cap bound memory:
40 bits covers |ball| up to ~10^12 before saturating, enough for a
10^10-page crawl. Rounds are fixed (ANF truncates at h_max, typically
~16 for web graphs), so the loop needs no convergence action at all —
each round is pure plan construction plus one lineage-cutting checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PHI = 0.77351  # Flajolet-Martin bias correction


def _seed_bit(id_col, r: int, nibbles: int):
    """1L << tz(first `nibbles`*4 bits of md5(id + '#r')) — the FM seed."""
    x = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(f"#{r}"))), 1, nibbles),
        16,
        10,
    ).cast("long")
    # trailing zeros: bit_count((x & -x) - 1); x == 0 (p = 2^-40) -> cap
    tz = F.when(x == 0, F.lit(nibbles * 4)).otherwise(
        F.bit_count(x.bitwiseAND(-x) - 1)
    )
    # F.shiftleft only takes a Python int for numBits; call the SQL
    # function directly to shift by a computed column
    return F.call_function("shiftleft", F.lit(1).cast("long"), tz)


def _lowest_zero_pos(s):
    """Position of the lowest 0 bit of sketch s (the FM 'R' statistic)."""
    return F.bit_count(F.bitwise_not(s).bitwiseAND(s + 1) - 1)


def anf_neighborhood(
    edges: DataFrame,
    rounds: int,
    num_sketches: int = 4,
    nibbles: int = 10,
    undirected: bool = False,
) -> DataFrame:
    """(h, sum_positions LONG, est_reach DOUBLE) for h = 0..rounds.

    ``sum_positions`` = Σ_v Σ_r lowest-zero-bit(sketch_r(v)) — an integer
    invariant any engine reproduces bit-for-bit; ``est_reach`` = the ANF
    estimate Σ_v 2^(mean_r pos) / PHI of Σ_v |ball(v, h)|.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if undirected:
        e = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct().repartition("dst").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    scols = [f"s{r}" for r in range(num_sketches)]
    state = nodes.select(
        "id",
        *[_seed_bit(F.col("id"), r, nibbles).alias(c)
          for r, c in enumerate(scols)],
    ).localCheckpoint(eager=True)

    out_rows = [_measure(state, 0, scols)]
    for h in range(1, rounds + 1):
        gathered = (
            e.join(state, e["dst"] == state["id"])
            .groupBy(F.col("src").alias("nid"))
            .agg(*[F.bit_or(c).alias(f"g_{c}") for c in scols])
        )
        new = (
            state.join(gathered, state["id"] == gathered["nid"], "left")
            .select(
                "id",
                *[
                    F.coalesce(
                        F.col(c).bitwiseOR(F.col(f"g_{c}")), F.col(c)
                    ).alias(c)
                    for c in scols
                ],
            )
            .localCheckpoint(eager=True)
        )
        state = new
        out_rows.append(_measure(state, h, scols))
    e.unpersist()
    res = out_rows[0]
    for r_df in out_rows[1:]:
        res = res.unionAll(r_df)
    return res


def _measure(state: DataFrame, h: int, scols: list[str]) -> DataFrame:
    pos_sum = None
    for c in scols:
        p = _lowest_zero_pos(F.col(c))
        pos_sum = p if pos_sum is None else pos_sum + p
    per_node = state.select(
        pos_sum.cast("long").alias("b_sum"),
        (F.pow(F.lit(2.0), pos_sum / F.lit(len(scols))) / F.lit(PHI)).alias(
            "est"
        ),
    )
    return per_node.agg(
        F.sum("b_sum").alias("sum_positions"),
        F.round(F.sum("est"), 3).alias("est_reach"),
    ).select(F.lit(h).cast("int").alias("h"), "sum_positions", "est_reach")


def harmonic_est_table(num_sketches: int, nibbles: int) -> list[float]:
    """FM ball-size estimate per integer bit-position sum: TABLE[p] =
    round(2^(p / R) / PHI, 6). Materialized as Python literals so every
    engine (Spark, DuckDB, the pytest oracle) indexes the SAME doubles —
    computing 2^(p/R) natively differs by 1 ulp across libm
    implementations, which survives any decimal rounding at a boundary."""
    cap = num_sketches * (nibbles * 4 + 1)  # lowest-zero-pos <= 4*nibbles+1
    return [round(2.0 ** (p / num_sketches) / PHI, 6) for p in range(cap + 1)]


def harmonic_centrality(
    edges: DataFrame,
    rounds: int,
    num_sketches: int = 4,
    nibbles: int = 10,
    direction: str = "in",
) -> DataFrame:
    """(id, harmonic) — HyperBall harmonic centrality (Boldi & Vigna,
    "In-Core Computation of Geometric Centralities with HyperBall", 2013):

        H(x) = Σ_{y≠x} 1/d(y,x)  ≈  Σ_{h=1..rounds} (|B(x,h)| - |B(x,h-1)|)/h

    with ball sizes estimated by the same md5-seeded Flajolet-Martin
    sketches as anf_neighborhood. ``direction="in"`` measures reachability
    INTO x (the Common Crawl host-ranking metric — edges are reversed so
    each gather absorbs in-neighbors' balls); ``"out"`` uses forward balls.

    Determinism: each per-round estimate comes from the shared literal
    table (harmonic_est_table) indexed by the INTEGER bit-position sum,
    and the telescoping terms are added in ascending h — an engine
    replaying the integer sketch trajectory (the DuckDB twin) reproduces
    the output bit-for-bit. Scale shape = one |E|-row bit_or join +
    |V|-row left join per round, state is |V| × (R longs + 2 doubles).
    """
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    e = e.distinct().repartition("dst").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    scols = [f"s{r}" for r in range(num_sketches)]
    tbl = F.array(*[F.lit(v) for v in harmonic_est_table(num_sketches, nibbles)])

    def est(cols=None) -> F.Column:
        pos = None
        for c in scols:
            p = _lowest_zero_pos(F.col(c) if cols is None else cols[c])
            pos = p if pos is None else pos + p
        return F.element_at(tbl, pos + 1)

    state = nodes.select(
        "id",
        *[_seed_bit(F.col("id"), r, nibbles).alias(c)
          for r, c in enumerate(scols)],
    )
    state = state.select(
        "id", *scols, est().alias("est"), F.lit(0.0).alias("harm")
    ).localCheckpoint(eager=True)
    for h in range(1, rounds + 1):
        gathered = (
            e.join(state, e["dst"] == state["id"])
            .groupBy(F.col("src").alias("nid"))
            .agg(*[F.bit_or(c).alias(f"g_{c}") for c in scols])
        )
        merged = {
            c: F.coalesce(F.col(c).bitwiseOR(F.col(f"g_{c}")), F.col(c))
            for c in scols
        }
        new_est = est(merged)
        state = (
            state.join(gathered, state["id"] == gathered["nid"], "left")
            .select(
                "id",
                *[merged[c].alias(c) for c in scols],
                new_est.alias("est"),
                (F.col("harm") + (new_est - F.col("est")) / F.lit(float(h))
                 ).alias("harm"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    # floor(x*1e6 + 0.5)/1e6 instead of round(): every step is an IEEE
    # double op, so any engine reproduces it bit-for-bit — round() is
    # implemented differently across engines (BigDecimal vs multiply) and
    # disagrees on doubles that sit just under a .5 decimal boundary
    return state.select(
        "id",
        (F.floor(F.col("harm") * 1e6 + 0.5) / 1e6).alias("harmonic"),
    )


def effective_diameter(
    edges: DataFrame,
    max_rounds: int = 16,
    quantile: float = 0.9,
    num_sketches: int = 8,
    undirected: bool = True,
) -> int:
    """Smallest h with N(h) ≥ quantile · N(max_rounds) — the classic
    'effective diameter' readout. One small collect over max_rounds rows."""
    nf = {
        int(r["h"]): float(r["est_reach"])
        for r in anf_neighborhood(
            edges, max_rounds, num_sketches, undirected=undirected
        ).collect()
    }
    target = quantile * nf[max_rounds]
    for h in sorted(nf):
        if nf[h] >= target:
            return h
    return max_rounds
