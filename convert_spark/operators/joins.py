"""Distributed spatial joins (SURVEY.md §2.5).

The reference's only join-like computation is scalar point-in-multipolygon
(convert.go:763, 1011); these operators are its cluster-scale
generalizations per BASELINE north_star:

* ``pip_join`` — broadcast STRtree + exact ray-casting PIP,
* ``tile_join`` — plain cell-id equi-join (tile assignment),
* ``knn_join`` — cell-ring expansion + window top-k,
* ``salted_tile_join`` — explicit hot-cell salting for skew.

Scale notes (100 TB thinking):
* the polygon layer is the SMALL side by construction (admin boundaries /
  tile schemes are << points); it is STRtree-indexed once on the driver
  and broadcast — the points side never shuffles for pip_join.
* ``knn_join`` shuffles only candidate pairs found via ring cells, never
  the cross product; ring radius doubles per round so the number of
  shuffle rounds is logarithmic in the distance to the k-th neighbor.
* skew: dense urban cells are salted explicitly (north_rule) — AQE skew
  split remains on as a backstop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..kernels import pip as pip_kernel
from ..kernels import strtree as strtree_kernel


def _polygon_index(polygons_pdf: pd.DataFrame):
    """Driver-side build: columnar ring encoding + STRtree over poly bboxes.

    polygons_pdf columns: poly_id, rings ([ring][vertex][lon,lat]).
    """
    closed_rings: list[list[np.ndarray]] = []  # per polygon: CLOSED rings
    boxes = np.empty((len(polygons_pdf), 4), dtype=np.float64)
    for i, rings in enumerate(polygons_pdf["rings"]):
        minx = miny = np.inf
        maxx = maxy = -np.inf
        poly_rings = []
        for ring in rings:
            arr = np.asarray(ring, dtype=np.float64)[:, :2]
            # close once at build time — the refine loop would otherwise
            # re-close every candidate ring on every Arrow batch
            poly_rings.append(pip_kernel._close_ring(arr))
            minx = min(minx, arr[:, 0].min())
            maxx = max(maxx, arr[:, 0].max())
            miny = min(miny, arr[:, 1].min())
            maxy = max(maxy, arr[:, 1].max())
        closed_rings.append(poly_rings)
        boxes[i] = (minx, miny, maxx, maxy)
    payload = {
        "rings": closed_rings,
        "poly_ids": polygons_pdf["poly_id"].to_numpy(np.int64),
        "tree": strtree_kernel.STRtree(boxes),
        "n_polys": len(polygons_pdf),
    }
    return payload


def _match_pairs(idx, px: np.ndarray, py: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(point_idx, poly_id) pairs for every point-in-polygon containment:
    STRtree bbox candidates, then exact even-odd ray casting batched by
    candidate polygon (rings were closed at index-build time).

    Candidates are grouped per polygon by ONE sort + contiguous slices
    (round 8): the previous per-polygon boolean masks re-scanned the
    whole candidate array once per polygon — O(polys x candidates) just
    to group, ~6x the refine cost on a dense urban batch. Pair order out
    is unchanged (the inside mask is scattered back to candidate order).
    """
    tree: strtree_kernel.STRtree = idx["tree"]
    qi, ii = tree.query_points(px, py)
    if qi.size:
        order = np.argsort(ii, kind="stable")
        qi_s, ii_s = qi[order], ii[order]
        uniq, starts = np.unique(ii_s, return_index=True)
        ends = np.append(starts[1:], ii_s.size)
        inside_s = np.zeros(qi.size, dtype=bool)
        for poly, s, e in zip(uniq, starts, ends):
            pxs = px[qi_s[s:e]]
            pys = py[qi_s[s:e]]
            crossings = np.zeros(int(e - s), dtype=np.int64)
            # even-odd over ALL rings: a point crossing an even count of
            # ring edges (outer + hole) is outside — the doughnut filter
            for ring in idx["rings"][poly]:
                if ring.shape[0] < 4:
                    continue
                crossings += pip_kernel.ring_crossings(pxs, pys, ring)
            inside_s[s:e] = (crossings & 1).astype(bool)
        inside = np.zeros(qi.size, dtype=bool)
        inside[order] = inside_s
        qi, ii = qi[inside], ii[inside]
    return qi, idx["poly_ids"][ii]


def pip_join(
    points: DataFrame,
    polygons_pdf: pd.DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    how: str = "inner",
) -> DataFrame:
    """Broadcast spatial join: each point row gains ``poly_id`` for every
    polygon containing it (inner) or NULL if none (left).

    Physical plan: no shuffle at all — the polygon STRtree is broadcast
    via SparkContext.broadcast, evaluated by a scalar Arrow UDF that sees
    ONLY the (lon, lat) columns and returns the array of containing poly
    ids; a JVM-side ``explode`` / ``explode_outer`` then produces the
    inner/left pair rows. Compared to the earlier mapInPandas form, the
    point row's OTHER columns never cross the JVM<->Python boundary —
    Arrow traffic is 16 bytes in + the (mostly empty) id list out per
    row, the per-batch row gather moves into whole-stage codegen, and the
    points side keeps its partitioning. Measured: the single-host Arrow
    transfer path was this stage's scaling ceiling (BENCH_SCALING.md).
    """
    sc = points.sparkSession.sparkContext
    bc = sc.broadcast(_polygon_index(polygons_pdf))

    @F.pandas_udf("array<long>")
    def containing_polys(lon: pd.Series, lat: pd.Series) -> pd.Series:
        idx = bc.value
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        if not px.size:
            return pd.Series([], dtype=object)
        qi, poly_col = _match_pairs(idx, px, py)
        # qi ascending -> per-point slices via one bincount + split (no
        # per-row python assembly; np.split yields views, not copies).
        # Zero-match points get None, NOT an empty list: explode and
        # explode_outer treat NULL and [] identically (tested), and the
        # object->Arrow list conversion then skips the majority case
        # (uniform-globe points mostly miss every polygon).
        out = np.full(px.size, None, dtype=object)
        if qi.size:
            hit = np.unique(qi)
            order = np.argsort(qi, kind="stable")
            counts = np.bincount(qi, minlength=px.size)
            # object-array intermediate: a bare list of EQUAL-length
            # pieces would otherwise be coerced to 2-D on some numpy
            # versions and fail the fancy-indexed assignment
            pieces = np.empty(hit.size, dtype=object)
            pieces[:] = np.split(poly_col[order], np.cumsum(counts[hit])[:-1])
            out[hit] = pieces
        return pd.Series(out)

    # optimizer fence (guide §4.4): in inner mode the explode below has an
    # implicit size>0/isnotnull filter that Catalyst pushes down WITH a
    # duplicated ArrowEvalPython — every point paid the PIP probe twice
    # (plan-confirmed; the UDF is pure, marking only stops the cloning)
    containing_polys = containing_polys.asNondeterministic()

    # collision-proof temp name: a points column literally named "_polys"
    # would otherwise be silently overwritten and returned corrupted
    tmp = "_polys"
    while tmp in points.columns:
        tmp += "_"
    tagged = points.withColumn(tmp, containing_polys(F.col(lon_col), F.col(lat_col)))
    ex = F.explode_outer(tmp) if how == "left" else F.explode(tmp)
    return tagged.select(*points.columns, ex.alias("poly_id"))


def tile_join(points: DataFrame, tiles: DataFrame, on: list[str] | None = None, broadcast_tiles: bool = True) -> DataFrame:
    """Tile-assignment equi-join on cell id (the BASELINE headline join).

    The tile dimension is broadcast when small; otherwise a plain shuffled
    hash join on the cell key (AQE handles residual skew)."""
    keys = on or ["zoom", "cell_id"]
    right = F.broadcast(tiles) if broadcast_tiles else tiles
    return points.join(right, keys, "inner")


def salted_tile_join(
    points: DataFrame,
    tiles: DataFrame,
    n_salt: int = 8,
    on: list[str] | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe variant (north_rule: hot cells salted explicitly).

    Points get ``salt = pmod(hash(row fingerprint), n_salt)``; the tile
    side is replicated n_salt times so the join key (cell, salt) spreads
    each hot cell over n_salt reducers.

    ``salt_cols`` names the columns hashed into the salt — pass the
    row's id column when rows are wide: hashing every column pulls the
    whole payload (and, after Catalyst projection collapse, any
    expensive expressions that COMPUTE it) into the salt expression,
    which can cost more than the skew it removes. Default: all columns
    (safe for slim rows).
    """
    keys = on or ["zoom", "cell_id"]
    # deterministic salt from the row's own columns: monotonically_
    # increasing_id is nondeterministic under partial stage recomputation
    # (executor loss re-salts rows differently than surviving shuffle
    # files -> silent row loss/duplication)
    if "salt" in points.columns or "salt" in tiles.columns:
        # fail loudly: withColumn would silently overwrite (and the final
        # drop would destroy) a caller's payload column — cf. pip_join's
        # collision guard for its temp column
        raise ValueError("salted_tile_join: inputs must not carry a 'salt' column")
    salted_points = points.withColumn(
        "salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in (salt_cols or points.columns)]), F.lit(n_salt)),
    )
    salted_tiles = _salt_replicate(tiles, n_salt, "salt")
    return salted_points.join(salted_tiles, keys + ["salt"], "inner").drop("salt")


def _salt_replicate(df: DataFrame, n_salt: int, salt_col: str) -> DataFrame:
    """One row per (input row, salt value 0..n_salt-1) — the replicated
    side of an explicit salted join.

    Replicates via explode of a LITERAL array, NOT crossJoin(range(n_salt)):
    a cross join's size estimate MULTIPLIES the two sides' sizeInBytes, so
    Catalyst/AQE sees the tiny replicated dim as multi-GiB, declares it
    un-broadcastable, and (when the other side is pruned to slim join keys)
    broadcasts the BIG side instead — a 720 MiB 6M-row broadcast build
    measured 4-5x the whole q_salted_join at sf1.0, and a 128 MiB ref-side
    broadcast in the kNN probe. Explode keeps the estimate proportional to
    the real fan-out; the emitted rows are identical."""
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    return df.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))


def _ring_candidates(q: DataFrame, r: DataFrame, ring: int, zoom: int, query_id: str,
                     n_salt: int = 0) -> DataFrame:
    """Candidate pairs for one ring radius: queries explode into
    (2*ring+1)^2 ring cells (a literal offsets array exploded in-stage,
    no UDF) and equi-join refs on the ring cell — the cross product never
    materializes, and the shuffle key is the cell id.

    ``n_salt`` > 0 salts the cell join key: queries take
    ``salt = pmod(xxhash64(query_id), n_salt)`` (deterministic — random
    salts re-salt differently under stage recomputation, cf.
    salted_tile_join) and the slim ref side replicates n_salt times, so
    a hot cell key spreads over n_salt reducers; every (query, ring-ref)
    pair still appears exactly once because a query row carries exactly
    one salt value.

    MEASURED FINDING (bench.py skew_stress `knn_*` keys): at every
    tested hot-cell shape — 30% and 90% of queries in one cell, and
    dense co-location with 30% of refs in the same cell — salting is a
    net pessimization (1.5-3x) for THIS operator, because the ranking
    window repartitions by query id immediately after the join (the
    expensive stage rebalances itself), the hot join partitions are
    cheap stream-merge output, and AQE's skew split handles oversized
    ones; the n_salt replication shuffle is pure added cost. It stays in
    the API for the one regime measurement can't reach locally: a single
    key whose join OUTPUT exceeds one task's spill budget with AQE off."""
    from ..functions import exprs

    n = 1 << zoom
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    # explode a literal offsets array, NOT crossJoin(broadcast(offsets)):
    # the cross join MULTIPLIES the query side's size estimate by the
    # offsets table's bytes (~2300x at ring 8), after which the planner
    # broadcasts the REF side instead — a 128 MiB 1.5M-row build measured
    # at 10x scale where the probe's query side is the genuinely small one.
    # Explode keeps the estimate proportional to the real fan-out, so the
    # planner picks the build side per phase (cf. salted_tile_join).
    off_arr = F.array(
        *[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy")) for dx, dy in offsets]
    )
    qq = (
        q.withColumn("_off", F.explode(off_arr))
        .withColumn("n_tx", F.pmod(F.col("q_tx") + F.col("_off.dx"), F.lit(n)))
        .withColumn("n_ty", F.col("q_ty") + F.col("_off.dy"))
        .filter((F.col("n_ty") >= 0) & (F.col("n_ty") < n))
        .withColumn("r_cell", exprs.morton_cell(F.col("n_tx"), F.col("n_ty"), zoom))
        .select(query_id, "q_lat", "q_lon", "r_cell")
        # the ring is a SET: when 2*ring+1 > 2^zoom the longitude wrap maps
        # several dx offsets to the same cell — duplicates would consume
        # top-k ranks (cf. kernels.quadkey.k_ring)
        .dropDuplicates([query_id, "r_cell"])
    )
    if n_salt > 0:
        qq = qq.withColumn("__salt", F.pmod(F.xxhash64(F.col(query_id)), F.lit(n_salt)))
        return qq.join(_salt_replicate(r, n_salt, "__salt"), ["r_cell", "__salt"], "inner").drop("__salt")
    return qq.join(r, "r_cell", "inner")


def _tile_row_north_lat(t: int, n: int) -> float:
    """North-edge latitude (degrees) of tile row ``t`` at ``n = 2^zoom``."""
    import math

    return math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * t / n))))


def _tile_row_of(lat: float, n: int) -> int:
    """Python twin of exprs.tile_y (same clamp + floor)."""
    import math

    from ..functions.exprs import LAT_MAX, LAT_MIN

    lat_c = min(max(lat, LAT_MIN), LAT_MAX)
    lr = math.radians(lat_c)
    merc = math.log(math.tan(lr) + 1.0 / math.cos(lr))
    t = math.floor((1.0 - merc / math.pi) / 2.0 * n)
    return int(min(max(t, 0), n - 1))


def _latlon_extremes(q: DataFrame, r: DataFrame) -> tuple[float, float, float, float] | None:
    """(lat_lo, lat_hi, lon_lo, lon_hi) over both sides, or None if either
    side is empty — two bounded 1-row driver collects."""
    qa = q.agg(
        F.min("q_lat"), F.max("q_lat"), F.min("q_lon"), F.max("q_lon")
    ).collect()[0]
    ra = r.agg(
        F.min("r_lat"), F.max("r_lat"), F.min("r_lon"), F.max("r_lon")
    ).collect()[0]
    if any(v is None for v in (*qa, *ra)):
        return None
    return (min(qa[0], ra[0]), max(qa[1], ra[1]), min(qa[2], ra[2]), max(qa[3], ra[3]))


def _prune_bound_at(ext: tuple[float, float, float, float], zoom: int) -> float | None:
    """Strictly positive lower bound B (degrees) such that ANY query/ref
    pair whose tiles are at Chebyshev tile distance >= 2 at ``zoom`` has
    planar-equirectangular distance^2 >= B^2 — the geometric prune behind
    the density probes in knn_join.

    Derivation: wrapped tile-x distance >= 2 leaves at least one full
    tile column strictly between the two points, so their circular (and
    hence planar) lon separation is >= the tile width 360/2^zoom;
    tile-y distance >= 2 leaves a full tile row between them, so lat
    separation >= that row's height — tile heights (in degrees) are
    maximal at the equator and shrink monotonically poleward, so the
    minimum over the occupied row range is attained at its ends.

    Returns None (probe disabled, caller falls back to the exact ring
    schedule) when any point lies outside the web-mercator lat range /
    [-180, 180] lon range — tile clamping would put such a point
    geometrically outside its tile and void the bound.
    """
    from ..functions.exprs import LAT_MAX, LAT_MIN

    n = 1 << zoom
    lat_lo, lat_hi, lon_lo, lon_hi = ext
    if not (LAT_MIN <= lat_lo and lat_hi <= LAT_MAX and -180.0 <= lon_lo and lon_hi <= 180.0):
        return None
    t_hi = _tile_row_of(lat_hi, n)  # northmost occupied row (smallest index)
    t_lo = _tile_row_of(lat_lo, n)
    bound = 360.0 / n
    # +-1 row slack absorbs any Python-vs-JVM 1-ulp row-boundary diff
    for t in {max(t_hi - 1, 0), t_hi, min(t_lo + 1, n - 1), t_lo}:
        bound = min(bound, _tile_row_north_lat(t, n) - _tile_row_north_lat(t + 1, n))
    return bound if bound > 0.0 else None


def knn_join(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    zoom: int = 6,
    ring: int = 2,
    max_ring: int | None = None,
    query_id: str = "query_id",
    ref_id: str = "ref_id",
    n_salt: int = 0,
    round_stats: list | None = None,
    probe_ring: int | None = 1,
) -> DataFrame:
    """kNN join with cell-ring expansion and RING DOUBLING for stragglers
    (SURVEY.md §2.5; north_star "kNN-matched with cell-ring expansion").

    Each query ranks the refs within Chebyshev tile distance R(q) of its
    tile at ``zoom``, where R(q) is the smallest radius in the doubling
    schedule [ring, 2*ring, ..., max_ring] whose ring holds at least k
    candidate refs — queries in sparse regions widen, queries in dense
    regions stay narrow. Fewer than k rows come back only when even
    max_ring holds fewer than k refs. max_ring=None (or == ring) is the
    fixed-ring special case.

    Contract (oracle-checkable): R(q) is a pure function of candidate
    counts, so the DuckDB oracle re-states the identical schedule in SQL.
    Distance is planar-equirectangular on (lat, lon) degrees, ties broken
    by ref id.

    Scale path: per round, only the STRAGGLER queries (those whose current
    ring held < k candidates) re-join at the doubled radius — the number
    of rounds is logarithmic in max_ring/ring and each round's join input
    shrinks. At 100 TB, run zoom high enough that a cell holds O(k) refs;
    the doubling bounds the fanout a wide fixed ring would pay everywhere.

    ``probe_ring`` (default 1; None disables; only active when
    probe_ring < ring): a cascaded ring-1 density probe (zoom+2, then
    zoom) that answers dense queries from a 3x3 tile neighborhood
    whenever their k-th probe distance is provably smaller than any
    candidate outside the probe ring (_prune_bound_at) — a pure
    optimization, output identical row-for-row; sparse stragglers fall
    through to the exact schedule.
    """
    from ..functions import exprs

    max_ring = ring if max_ring is None else max_ring
    q = (
        queries.select(query_id, F.col("lat").alias("q_lat"), F.col("lon").alias("q_lon"))
        .withColumn("q_tx", exprs.tile_x(F.col("q_lon"), zoom))
        .withColumn("q_ty", exprs.tile_y(F.col("q_lat"), zoom))
    )
    r = (
        refs.select(ref_id, F.col("lat").alias("r_lat"), F.col("lon").alias("r_lon"))
        .withColumn("r_tx", exprs.tile_x(F.col("r_lon"), zoom))
        .withColumn("r_ty", exprs.tile_y(F.col("r_lat"), zoom))
        .withColumn("r_cell", exprs.morton_cell(F.col("r_tx"), F.col("r_ty"), zoom))
    )

    # squared distance via explicit multiply: `** 2` compiles to Math.pow,
    # which is not exactly-rounded — the oracle's (a-b)*(a-b) then disagrees
    # at 1-ulp level and flips near-tie rankings
    def ranked_topk(cand: DataFrame) -> DataFrame:
        dlat = F.col("q_lat") - F.col("r_lat")
        dlon = F.col("q_lon") - F.col("r_lon")
        out = cand.withColumn("dist", dlat * dlat + dlon * dlon).withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(ref_id).asc())
            ),
        )
        return out.filter(F.col("rn") <= k).select(
            query_id, ref_id, F.col("dist").alias("dist2"), F.col("rn").alias("rank")
        )

    remaining = q
    rounds: list[DataFrame] = []

    # Density-probe CASCADE: answer dense queries from a ring-1 (3x3
    # cell) neighborhood — first at zoom+2 (cells 4x smaller per axis,
    # ~16x fewer candidates), then at the operator zoom — and run the
    # (much wider) ring schedule only for the true stragglers. Provably
    # result-identical: a ring-1 neighborhood at any deeper-or-equal
    # zoom is a SUBSET of the operator-zoom candidate set (a zoom+dz
    # neighbor cell lies within 2^-dz of the query's own operator-zoom
    # cell), and every candidate OUTSIDE a probe's ring sits at Chebyshev
    # tile distance >= 2 AT THAT PROBE ZOOM, hence at planar distance^2
    # >= B^2 (_prune_bound_at); a query whose k-th probe distance is
    # strictly below B^2 therefore already holds its exact global top-k,
    # with identical ranks (no outside candidate can sort before any
    # kept row, so ties/tiebreaks are untouched). At dense scale this
    # replaces the (2*ring+1)^2-cell candidate join (289 cells/query at
    # ring 8) with a 9-cell probe whose dominant cost — the local sort
    # feeding the WindowGroupLimit rank pushdown — shrinks with the
    # probe's candidate volume.
    if probe_ring is not None and 0 < probe_ring < ring:
        ext = _latlon_extremes(q, r)
        deep = min(zoom + 2, 30)
        probe_zooms = ([] if ext is None else ([deep] if deep != zoom else []) + [zoom])
        for pz in probe_zooms:
            bound = _prune_bound_at(ext, pz)
            if bound is None:
                break
            b2 = bound * bound
            if pz == zoom:
                qz, rz = remaining, r
            else:
                qz = (
                    remaining.select(query_id, "q_lat", "q_lon")
                    .withColumn("q_tx", exprs.tile_x(F.col("q_lon"), pz))
                    .withColumn("q_ty", exprs.tile_y(F.col("q_lat"), pz))
                )
                rz = (
                    r.select(ref_id, "r_lat", "r_lon")
                    .withColumn("r_tx", exprs.tile_x(F.col("r_lon"), pz))
                    .withColumn("r_ty", exprs.tile_y(F.col("r_lat"), pz))
                    .withColumn("r_cell", exprs.morton_cell(F.col("r_tx"), F.col("r_ty"), pz))
                )
            cand = _ring_candidates(qz, rz, probe_ring, pz, query_id, n_salt=n_salt)
            dlat = F.col("q_lat") - F.col("r_lat")
            dlon = F.col("q_lon") - F.col("r_lon")
            w_rank = Window.partitionBy(query_id).orderBy(
                F.col("dist").asc(), F.col(ref_id).asc()
            )
            w_q = Window.partitionBy(query_id)
            topk = (
                cand.withColumn("dist", dlat * dlat + dlon * dlon)
                .withColumn("rn", F.row_number().over(w_rank))
                # rank filter directly above row_number -> WindowGroupLimit
                # partial prunes to top-k per query BEFORE the exchange
                .filter(F.col("rn") <= k)
                # max(rn) == k <=> the probe ring held >= k candidates;
                # max(dist) = the k-th probe distance (same partitioning
                # and an already-satisfied sort: no extra exchange)
                .withColumn("__mx", F.max("rn").over(w_q))
                .withColumn("__dk", F.max("dist").over(w_q))
                .withColumn("__ok", (F.col("__mx") == k) & (F.col("__dk") < F.lit(b2)))
                .select(
                    query_id,
                    ref_id,
                    F.col("dist").alias("dist2"),
                    F.col("rn").alias("rank"),
                    "__ok",
                )
                .localCheckpoint(eager=True)
            )
            rounds.append(topk.filter(F.col("__ok")).drop("__ok"))
            sat = topk.filter(F.col("__ok")).select(query_id).distinct()
            remaining = remaining.join(sat, query_id, "left_anti").localCheckpoint(eager=True)
            n_pruned_stragglers = remaining.count()
            if round_stats is not None:
                round_stats.append((probe_ring, n_pruned_stragglers))
            if n_pruned_stragglers == 0:
                out = rounds[0]
                for extra in rounds[1:]:
                    out = out.unionByName(extra)
                return out

    cur = ring
    while True:
        cand = _ring_candidates(remaining, r, cur, zoom, query_id, n_salt=n_salt)
        if cur >= max_ring:
            rounds.append(ranked_topk(cand))  # last round: rank whatever exists
            break
        # Each non-final round runs the big candidate join EXACTLY ONCE, in
        # ONE job: rank AND per-query candidate count share the same window
        # shuffle (same partition key — one exchange, one sort), and only
        # the <= k x n_queries result rows are eagerly localCheckpoint-ed.
        # Satisfied queries' rows ARE this round's output; stragglers'
        # rows are discarded (the doubled ring re-ranks a superset). The
        # loop is driven off the straggler count — a second, tiny job over
        # the checkpointed rows + an anti-join, never re-touching the join.
        # Checkpoint-block lifetime: the returned union's plan references
        # these RDDs, so Spark's ContextCleaner unpersists them once the
        # caller drops the result (JVM GC) — bounded per call and
        # result-scoped, the same lifecycle CacheScope gives the
        # similarity paths' persists.
        dlat = F.col("q_lat") - F.col("r_lat")
        dlon = F.col("q_lon") - F.col("r_lon")
        w_rank = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(ref_id).asc())
        w_cnt = Window.partitionBy(query_id)
        topk = (
            cand.withColumn("dist", dlat * dlat + dlon * dlon)
            .withColumn("rn", F.row_number().over(w_rank))
            .withColumn("__n", F.count(F.lit(1)).over(w_cnt))
            .filter(F.col("rn") <= k)
            .select(
                query_id,
                ref_id,
                F.col("dist").alias("dist2"),
                F.col("rn").alias("rank"),
                (F.col("__n") >= k).alias("__sat"),
            )
            .localCheckpoint(eager=True)
        )
        rounds.append(topk.filter(F.col("__sat")).drop("__sat"))
        sat = topk.filter(F.col("__sat")).select(query_id).distinct()
        # checkpoint the straggler set: without it the next round's
        # candidate join AND the count below would each re-execute the
        # full upstream queries lineage plus the growing anti-join chain
        remaining = remaining.join(sat, query_id, "left_anti").localCheckpoint(eager=True)
        n_stragglers = remaining.count()
        if round_stats is not None:
            round_stats.append((cur, n_stragglers))
        if n_stragglers == 0:  # trivial job over the checkpointed rows
            break
        cur = min(cur * 2, max_ring)
    out = rounds[0]
    for extra in rounds[1:]:
        out = out.unionByName(extra)
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    on: list[str] | None = None,
) -> DataFrame:
    """RANGE (interval) join via binning (engine addition, task-brief
    "operators Spark lacks"): inner-join every point row to every
    interval row with lo <= value <= hi (optionally also matching ``on``
    equi-keys).

    Spark plans the naive ``v between lo and hi`` theta-join as a
    BroadcastNestedLoopJoin / CartesianProduct — O(|points| x
    |intervals|) comparisons. Here both sides bin by value:
    points get bin = floor(v / bin_size); each interval replicates into
    ONLY the ceil(len/bin_size)+1 bins it overlaps (a JVM ``sequence`` +
    ``explode``, no UDF); the join is an equi-join on (keys..., bin) and
    the exact between refines the matches. The shuffle key is the bin:
    at 100 TB pick bin_size near the median interval length so the
    replication factor stays ~2 and hot bins fall to AQE skew-split.
    Inner semantics only; intervals with hi < lo are dropped (they can
    match nothing, and Spark's ``sequence`` would enumerate DESCENDING
    for them, silently binning garbage).
    """
    tmp = "__bin"
    while tmp in points.columns or tmp in intervals.columns:
        tmp += "_"
    v = F.col(value_col)
    lo, hi = F.col(lo_col), F.col(hi_col)
    p = points.withColumn(tmp, F.floor(v / F.lit(bin_size)).cast("long"))
    i = intervals.filter(hi >= lo).withColumn(
        tmp,
        F.explode(
            F.sequence(
                F.floor(lo / F.lit(bin_size)).cast("long"),
                F.floor(hi / F.lit(bin_size)).cast("long"),
            )
        ),
    )
    keys = (on or []) + [tmp]
    return p.join(i, keys, "inner").filter((v >= lo) & (v <= hi)).drop(tmp)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    right_cols: list[str],
    tiebreak_col: str | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """AS-OF join (engine addition, north-star training-pipeline op): each
    left row gains the ``right_cols`` of the LATEST right row with the
    same ``on`` keys and right.ts <= left.ts (< when ``inclusive`` is
    False); NULL when no prior right row exists.

    Distributed shape — the classic union + running last_value plan:
    both sides are tagged and unioned, then ONE window partitioned by the
    join keys and ordered by (ts, side, tiebreak) carries the right row
    forward with ``last(ignorenulls)``. The right columns travel as ONE
    struct, not independently: a right row whose ``right_cols`` contain
    NULLs must still win as a whole (per-column carry would mix fields
    from DIFFERENT right rows — the struct itself is non-null for every
    right row, so ignorenulls skips only left rows). Exactly one shuffle
    (on the join keys), no per-key loops, no range-join explosion: at
    100 TB the cost is a sort within each key partition, and skewed keys
    fall to AQE like any other window. ``tiebreak_col`` makes the pick
    deterministic when several right rows share a timestamp (the highest
    tiebreak value wins).
    """
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join right_cols {sorted(clash)} collide with left columns; "
            "rename one side before joining"
        )
    side = "__asof_side"
    tb = "__asof_tb"
    rstruct = "__asof_r"
    # a right row with NULL ts can never satisfy right.ts <= left.ts —
    # drop it up front (Spark's asc sort is NULLS FIRST, so an unfiltered
    # NULL-ts right row would otherwise be carried to EVERY left row).
    # NULL join keys likewise: Window.partitionBy groups NULLs together,
    # so an unfiltered NULL-keyed right row would match NULL-keyed left
    # rows — SQL equi-join semantics (and the oracle) never match NULL.
    right_keep = F.col(ts_col).isNotNull()
    for key in on:
        right_keep = right_keep & F.col(key).isNotNull()
    right_sel = right.filter(right_keep).select(
        *on,
        F.col(ts_col),
        F.struct(*[F.col(c) for c in right_cols]).alias(rstruct),
        F.lit(0).alias(side),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias(tb),
    )
    left_sel = left.withColumn(side, F.lit(1)).withColumn(tb, F.lit(0))
    u = left_sel.unionByName(right_sel, allowMissingColumns=True)
    # inclusive: right rows at equal ts sort BEFORE left (side 0 < 1) and
    # are visible; exclusive: left first at equal ts, so they are not
    side_order = F.col(side).asc() if inclusive else F.col(side).desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), side_order, F.col(tb).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select("*", F.last(F.col(rstruct), ignorenulls=True).over(w).alias("__r"))
    out = carried.filter(F.col(side) == 1).select(
        *[c for c in left.columns], *[F.col(f"__r.{c}").alias(c) for c in right_cols]
    )
    return out
