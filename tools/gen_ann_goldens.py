#!/usr/bin/env python3
"""Generate golden VALUES for the ANN family (e2 LSH / e5 IVF / e6
multi-probe) over a hand-computable fixture.

Fixture design makes floating point a non-issue: 4-dim vectors whose
squared norm is exactly 4 (norm 2.0, sqrt exact), so every pairwise
cosine is dot/4 — an exact small-rational double. Literal hyperplanes
(not the seeded Gaussian ones) make bucket ids sign-of-coordinate.

The only hashing involved is the IVF centroid pick (xxhash64 of the
vec_id), mirrored via the independent XXH64 in gen_hash_goldens.py.

Usage: python3 tools/gen_ann_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_hash_goldens import spark_xxh_long  # noqa: E402

# (vec_id, vector) — every squared norm is a PERFECT SQUARE, so norms are
# exact small doubles (sqrt(4)=2.0, sqrt(9)=3.0) and cosine is a single
# correctly-rounded IEEE division — bit-identical in the JVM and here.
FIXTURE = [
    (1, (2, 0, 0, 0)),
    (2, (1, 1, 1, 1)),
    (3, (2, 2, 1, 0)),
    (4, (1, 1, -1, -1)),
    (5, (-2, 0, 0, 0)),
    (6, (2, -1, 2, 0)),
    (7, (0, 0, 2, 0)),
    (8, (1, -2, 2, 0)),
]
PLANES = [(1, 0, 0, 0), (0, 1, 0, 0)]
K = 3


def dot(a, b):
    return sum(x * y for x, y in zip(a, b))


import math  # noqa: E402


def nrm(v):
    s = dot(v, v)
    r = math.isqrt(s)
    assert r * r == s, f"norm² {s} of {v} is not a perfect square"
    return float(r)


for _, v in FIXTURE:
    nrm(v)


def cosine(a, b):
    return dot(a, b) / (nrm(a) * nrm(b))


def bucket(v):
    return sum((1 << i) for i, p in enumerate(PLANES) if dot(v, p) > 0)


def topk(query_id, q_vec, cands, k):
    """Mirrors topKPerQuery: sort by (-cosine, neighbor_id), take k,
    dense ranks from 1. cands: [(id, vec)] excluding self already."""
    scored = sorted(((cosine(q_vec, cv), cid) for cid, cv in cands),
                    key=lambda t: (-t[0], t[1]))[:k]
    return [(query_id, r + 1, cid, cos) for r, (cos, cid) in enumerate(scored)]


def fmt_rows(rows):
    return ",\n".join("  |  (%s)" % ", ".join(repr(x) for x in r) for r in rows)


def main():
    print("== fixture (Scala Seq) ==")
    for i, v in FIXTURE:
        print(f"  ({i}L, Array({', '.join(str(float(x)) + 'f' for x in v)})),")

    # ---- e2: single-bucket LSH top-k --------------------------------
    rows = []
    for qid, qv in FIXTURE:
        b = bucket(qv)
        cands = [(cid, cv) for cid, cv in FIXTURE if cid != qid and bucket(cv) == b]
        rows += [(q, r, n, c, b) for (q, r, n, c) in topk(qid, qv, cands, K)]
    print("\n== e2_lsh_golden VALUES (query_id, rank, neighbor_id, cosine, bucket) ==")
    print(fmt_rows(rows))

    # ---- e6: multi-probe (bucket + all one-bit flips) ---------------
    rows = []
    for qid, qv in FIXTURE:
        b0 = bucket(qv)
        probes = {b0} | {b0 ^ (1 << i) for i in range(len(PLANES))}
        cands = [(cid, cv) for cid, cv in FIXTURE
                 if cid != qid and bucket(cv) in probes]
        rows += topk(qid, qv, cands, K)
    print("\n== e6_multiprobe_golden VALUES (query_id, rank, neighbor_id, cosine) ==")
    print(fmt_rows(rows))

    # ---- e5: IVF ----------------------------------------------------
    n_centroids, n_probe, k_ivf = 3, 2, 2
    # Centroid pick: the C ids with smallest (xxhash64(id), id); dense
    # centroid_id 0..C-1 follows cid_src sort order.
    picked = sorted(FIXTURE, key=lambda t: (spark_xxh_long(t[0], 42), t[0]))[:n_centroids]
    picked = sorted(picked, key=lambda t: t[0])
    centroids = [(ci, vid, v) for ci, (vid, v) in enumerate(picked)]
    print("\n-- IVF centroids (centroid_id <- vec_id):",
          [(ci, vid) for ci, vid, _ in centroids])
    # Assignment: argmax cosine; assert no ties so max_by is deterministic.
    assign = {}
    for vid, v in FIXTURE:
        scored = sorted(((cosine(v, cv), ci) for ci, _, cv in centroids),
                        key=lambda t: (-t[0], t[1]))
        assert len(scored) < 2 or scored[0][0] != scored[1][0], \
            f"cosine tie assigning {vid}: {scored} — adjust the fixture"
        assign[vid] = scored[0][1]
    print("-- IVF assignment:", assign)
    rows = []
    for qid, qv in FIXTURE:
        probes = [ci for _, ci in sorted(
            ((cosine(qv, cv), ci) for ci, _, cv in centroids),
            key=lambda t: (-t[0], t[1]))[:n_probe]]
        cands = [(cid, cv) for cid, cv in FIXTURE
                 if cid != qid and assign[cid] in probes]
        rows += topk(qid, qv, cands, k_ivf)
    print("\n== e5_ivf_golden VALUES (query_id, rank, neighbor_id, cosine) ==")
    print(fmt_rows(rows))

    # ---- e8: one Lloyd iteration (spherical k-means) ----------------
    # Init centroids chosen so no fixture vector ties between cells
    # (asserted) and every mean coordinate is an integer/4 — an exact
    # binary fraction, so the Spark double avg is bit-identical to this
    # mirror REGARDLESS of partial-aggregation order.
    kmeans_init = [(0, (2, 0, 0, 0)), (1, (1, 1, 1, 1))]
    cells = {ci: [] for ci, _ in kmeans_init}
    for vid, v in FIXTURE:
        scored = sorted(((cosine(v, cv), ci) for ci, cv in kmeans_init),
                        key=lambda t: (-t[0], t[1]))
        assert scored[0][0] != scored[1][0], \
            f"cosine tie assigning {vid}: {scored} — adjust kmeans_init"
        cells[scored[0][1]].append(v)
    print("\n-- kmeans cells:", {ci: len(vs) for ci, vs in cells.items()})
    rows = []
    for ci, vs in sorted(cells.items()):
        for d in range(4):
            s = sum(v[d] for v in vs)
            rows.append((ci, d, s / len(vs)))
    print("== e8_kmeans_golden VALUES (centroid_id, dim, value) ==")
    print(fmt_rows(rows))

    # ---- e9: product quantization — encode + ADC top-k ---------------
    # Explicit m=2/dsub=2 codebook chosen so every subspace argmin is
    # tie-free (asserted). Scores stay bit-exact: integer partial dots,
    # m=2 so the partial sum is ONE commutative IEEE addition, true norms
    # are exact small doubles, and the final division is a single IEEE op.
    pq_cb = [
        [(2, 0), (1, 1), (1, -2), (-2, 0)],   # subspace 0 (dims 0-1)
        [(0, -1), (1, 2), (2, 0), (-1, -1)],  # subspace 1 (dims 2-3)
    ]

    def pq_code(v):
        codes = []
        for j, cents in enumerate(pq_cb):
            sub = v[2 * j:2 * j + 2]
            # argmax of 2·x·c − c·c  ≡  argmin ‖x−c‖²; ties toward lower code
            keyed = sorted(
                ((2 * dot(sub, c) - dot(c, c), -ci) for ci, c in enumerate(cents)),
                reverse=True)
            assert keyed[0][0] != keyed[1][0], \
                f"L2 tie encoding {v} subspace {j}: {keyed} — adjust pq_cb"
            codes.append(-keyed[0][1])
        return codes

    enc = {vid: pq_code(v) for vid, v in FIXTURE}
    print("\n-- pq codes:", enc)
    rows = []
    for qid, qv in FIXTURE:
        cand = []
        for nid, nv in FIXTURE:
            if nid == qid:
                continue
            approx_dot = sum(
                float(dot(qv[2 * j:2 * j + 2], pq_cb[j][enc[nid][j]]))
                for j in range(2))
            cand.append((approx_dot / (nrm(qv) * nrm(nv)), nid))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rk, (score, nid) in enumerate(cand[:K], start=1):
            rows.append((qid, rk, nid, score))
    print("== e9_pq_golden VALUES (query_id, rnk, neighbor_id, cosine) ==")
    print(fmt_rows(rows))

    # ---- e10: IVF-PQ — coarse cells + PQ over RESIDUALS + probed ADC --
    # Coarse centroids = the e8 init pair (assignments proven tie-free
    # above). Residuals r = v − c_cell are small integers; the residual
    # codebook is derived from actual residual subvectors (printed below
    # as the Scala literal), so every L2 argmin is checked tie-free.
    # approx dot = dot(q, c_cell) + Σ_j dot(q_sub_j, cb_j[code_j]) — all
    # integer arithmetic until the single final IEEE division by the
    # exact norms, so the Spark result is bit-identical.
    coarse = [(0, (2, 0, 0, 0)), (1, (1, 1, 1, 1))]

    def coarse_assign(v):
        scored = sorted(((cosine(v, cv), ci) for ci, cv in coarse),
                        key=lambda t: (-t[0], t[1]))
        assert scored[0][0] != scored[1][0], \
            f"cosine tie assigning {v}: {scored} — adjust coarse"
        return scored[0][1]

    cell = {vid: coarse_assign(v) for vid, v in FIXTURE}
    resid = {vid: tuple(x - c for x, c in zip(v, coarse[cell[vid]][1]))
             for vid, v in FIXTURE}
    print("\n-- e10 coarse assignment:", cell)
    print("-- e10 residuals:", resid)

    # Residual codebook: per subspace, the FIRST (in deterministic
    # combination order) set of 4 distinct residual subvectors whose L2
    # argmin is tie-free for every residual — an explicit literal the
    # Scala entry embeds verbatim.
    import itertools

    def tie_free(cents, subs):
        for sub in subs:
            keyed = sorted((2 * dot(sub, c) - dot(c, c)) for c in cents)
            if keyed[-1] == keyed[-2]:
                return False
        return True

    res_cb = []
    for j in range(2):
        subs = [resid[vid][2 * j:2 * j + 2] for vid, _ in FIXTURE]
        distinct = sorted(set(subs))
        pick = next(c for c in itertools.combinations(distinct, 4)
                    if tie_free(list(c), subs))
        res_cb.append(list(pick))
    print("-- e10 residual codebook (Scala literal):")
    for j, cents in enumerate(res_cb):
        for ci, c in enumerate(cents):
            print(f"  ({j}, {ci}, Array({float(c[0])}, {float(c[1])})),")

    def res_code(vid):
        codes = []
        for j, cents in enumerate(res_cb):
            sub = resid[vid][2 * j:2 * j + 2]
            keyed = sorted(
                ((2 * dot(sub, c) - dot(c, c), -ci) for ci, c in enumerate(cents)),
                reverse=True)
            assert keyed[0][0] != keyed[1][0], \
                f"L2 tie encoding residual of {vid} subspace {j}: {keyed}"
            codes.append(-keyed[0][1])
        return codes

    enc10 = {vid: res_code(vid) for vid, v in FIXTURE}
    print("-- e10 residual codes:", enc10)

    n_probe10, k10 = 1, 3
    rows = []
    for qid, qv in FIXTURE:
        probes = [ci for _, ci in sorted(
            ((cosine(qv, cv), ci) for ci, cv in coarse),
            key=lambda t: (-t[0], t[1]))[:n_probe10]]
        cand = []
        for nid, nv in FIXTURE:
            if nid == qid or cell[nid] not in probes:
                continue
            q_dot_c = dot(qv, coarse[cell[nid]][1])
            res_dot = sum(
                dot(qv[2 * j:2 * j + 2], res_cb[j][enc10[nid][j]])
                for j in range(2))
            cand.append((float(q_dot_c + res_dot) / (nrm(qv) * nrm(nv)), nid))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rk, (score, nid) in enumerate(cand[:k10], start=1):
            rows.append((qid, rk, nid, score))
    print("== e10_ivfpq_golden VALUES (query_id, rnk, neighbor_id, cosine) ==")
    print(fmt_rows(rows))

    # ---- e10b: refine — exact re-rank of the ADC top-(r·k) shortlist --
    # Shortlist = the e10 ADC ranking extended to r·k candidates
    # (n_probe=1 unchanged); refine re-scores the shortlist with EXACT
    # cosines (integer dots / perfect-square norms — bit-exact) and keeps
    # the top k. Pins that the refined order is the EXACT order within
    # the shortlist, not the ADC order.
    r10b = 2
    vec = dict(FIXTURE)
    rows = []
    for qid, qv in FIXTURE:
        probes = [ci for _, ci in sorted(
            ((cosine(qv, cv), ci) for ci, cv in coarse),
            key=lambda t: (-t[0], t[1]))[:n_probe10]]
        cand = []
        for nid, nv in FIXTURE:
            if nid == qid or cell[nid] not in probes:
                continue
            q_dot_c = dot(qv, coarse[cell[nid]][1])
            res_dot = sum(
                dot(qv[2 * j:2 * j + 2], res_cb[j][enc10[nid][j]])
                for j in range(2))
            cand.append((float(q_dot_c + res_dot) / (nrm(qv) * nrm(nv)), nid))
        cand.sort(key=lambda t: (-t[0], t[1]))
        shortlist = [nid for _, nid in cand[:r10b * k10]]
        refined = sorted(((cosine(qv, vec[nid]), nid) for nid in shortlist),
                         key=lambda t: (-t[0], t[1]))[:k10]
        for rk, (score, nid) in enumerate(refined, start=1):
            rows.append((qid, rk, nid, score))
    print("\n== e10b_ivfpq_refined VALUES (query_id, rnk, neighbor_id, cosine) ==")
    print(fmt_rows(rows))

    # ---- e11: SemDeDup with explicit centroids ----------------------
    # Assignment by cosine to the literal centroids (ties asserted away —
    # centroid norms may be irrational, both engines compute the same
    # doubles); within-cluster pair cosines are exact rationals
    # (perfect-square vector norms); a vector is dropped iff a LOWER-id
    # clustermate sits within tau; n_within_tau counts tau-neighbors in
    # either direction.
    sem_cents = [(0, (2, 0, 0, 0)), (1, (0, 1, 2, 0))]
    tau = 0.6

    def cos_any(a, b):  # centroid norms need not be perfect squares
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    sem_assign = {}
    for vid, v in FIXTURE:
        scored = sorted(((cos_any(v, cv), ci) for ci, cv in sem_cents),
                        key=lambda t: (-t[0], t[1]))
        assert scored[0][0] != scored[1][0], \
            f"assignment tie for {vid}: {scored} — adjust centroids"
        sem_assign[vid] = scored[0][1]
    pairs = [(a, b) for (a, av) in FIXTURE for (b, bv) in FIXTURE
             if a < b and sem_assign[a] == sem_assign[b]
             and cosine(av, bv) >= tau]
    dropped = {b for _, b in pairs}
    neigh = {}
    for a, b in pairs:
        neigh[a] = neigh.get(a, 0) + 1
        neigh[b] = neigh.get(b, 0) + 1
    rows = [(vid, sem_assign[vid], neigh.get(vid, 0),
             "TRUE" if vid not in dropped else "FALSE")
            for vid, _ in FIXTURE]
    print("\n== e11_semdedup_golden VALUES (vec_id, centroid_id, n_within_tau, is_survivor) ==")
    for r in rows:
        print(f"  |  ({r[0]}, {r[1]}, {r[2]}, {r[3]}),")


if __name__ == "__main__":
    main()
