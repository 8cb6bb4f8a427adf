"""Formula-level reviews for the round-13 stats gates (CLAUDE.md lesson
8: a mirrored-wrong formula passes every oracle gate because the oracle
replays the same SQL — the algebra must be checked against an
INDEPENDENT replica).  Pure-Python; no Spark session needed."""

import itertools
import math
import random


def _dgim_sim(bits_hours):
    """Actual DGIM maintenance: newest-first bucket list; three buckets
    of a size merge the two OLDEST into the next size."""
    buckets = []
    for hour, bit in bits_hours:
        if not bit:
            continue
        buckets.insert(0, (1, hour))
        size = 1
        while True:
            idxs = [i for i, b in enumerate(buckets) if b[0] == size]
            if len(idxs) < 3:
                break
            i2, i1 = idxs[-1], idxs[-2]
            merged = (size * 2, buckets[i1][1])
            del buckets[i2]
            del buckets[i1]
            pos = 0
            while pos < len(buckets) and buckets[pos][1] > merged[1]:
                pos += 1
            buckets.insert(pos, merged)
            size *= 2
    return buckets


def _dgim_closed_form(ones_hours):
    """plans/pipeline40 algebra: bijective base-2 digits of n with
    bucket offsets = more-recent-ones counts."""
    n = len(ones_hours)
    ones = sorted(ones_hours)
    out = []
    k = 0
    pre = 0
    while True:
        pw = 1 << k
        if n - (pw - 1) < pw:
            break
        nk = (n - (pw - 1)) // pw
        dk = 2 - (nk % 2)
        for copy in range(1, dk + 1):
            off = pre + (copy - 1) * pw
            out.append((pw, ones[n - 1 - off], off))
        pre += dk * pw
        k += 1
    return out


def _dgim_estimate(buckets_with_off, cutoff):
    qual = [b for b in buckets_with_off if b[1] >= cutoff]
    if not qual:
        return 0
    mx = max(off for _, _, off in qual)
    return sum(2 * s for s, _, _ in qual) - next(
        s for s, _, off in qual if off == mx
    )


def test_dgim_closed_form_matches_simulation():
    rng = random.Random(7)
    for _ in range(200):
        hours = list(range(rng.randint(1, 700)))
        bits = [(h, rng.random() < 0.5) for h in hours]
        ones = [h for h, b in bits if b]
        sim = _dgim_sim(bits)
        cf = _dgim_closed_form(ones)
        assert sorted((s, t) for s, t in sim) == sorted(
            (s, t) for s, t, _ in cf
        )
        sim_off = []
        acc = 0
        for s, t in sim:
            sim_off.append((s, t, acc))
            acc += s
        assert sorted(sim_off) == sorted(cf)
        if ones and hours:
            for w in (64, 128, 256):
                cutoff = max(hours) - w + 1
                assert _dgim_estimate(sim_off, cutoff) == _dgim_estimate(
                    cf, cutoff
                )


def _simrank2_textbook(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    deg = {u: len(adj[u]) for u in nodes}

    def s0(i, j):
        return 1000000 if i == j else 0

    s1 = {}
    for a, b in itertools.combinations(nodes, 2):
        t = sum(s0(i, j) for i in adj[a] for j in adj[b])
        s1[(a, b)] = (4 * t) // (5 * deg[a] * deg[b])

    def s1f(i, j):
        if i == j:
            return 1000000
        return s1.get((min(i, j), max(i, j)), 0)

    s2 = {}
    for a, b in itertools.combinations(nodes, 2):
        t = sum(s1f(i, j) for i in adj[a] for j in adj[b])
        s2[(a, b)] = (4 * t) // (5 * deg[a] * deg[b])
    return s1, s2


def _simrank2_gate_algebra(edges):
    """Replays plans/pipeline40._SR_TAIL_SQL join-by-join."""
    adj = []
    for a, b in edges:
        adj.append((a, b))
        adj.append((b, a))
    deg = {}
    for u, _ in adj:
        deg[u] = deg.get(u, 0) + 1
    common = {}
    for (u1, v1) in adj:
        for (u2, v2) in adj:
            if u1 == u2 and v1 < v2:
                common[(v1, v2)] = common.get((v1, v2), 0) + 1
    s1 = {
        k: (4 * 1000000 * cm) // (5 * deg[k[0]] * deg[k[1]])
        for k, cm in common.items()
    }
    s1x = {}
    for (a, b), s in s1.items():
        s1x[(a, b)] = s
        s1x[(b, a)] = s
    cross = {}
    for (i, j), s in s1x.items():
        for (u1, a) in adj:
            if u1 != i:
                continue
            for (u2, b) in adj:
                if u2 != j:
                    continue
                if a < b:
                    cross[(a, b)] = cross.get((a, b), 0) + s
    s2 = {}
    for k in set(common) | set(cross):
        t = 1000000 * common.get(k, 0) + cross.get(k, 0)
        s2[k] = (4 * t) // (5 * deg[k[0]] * deg[k[1]])
    return s1, s2


def test_simrank_gate_algebra_matches_textbook():
    rng = random.Random(11)
    for _ in range(100):
        n = rng.randint(4, 9)
        nodes = [f"n{i}" for i in range(n)]
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(3, 14))
            }
        )
        p1, p2 = _simrank2_textbook(edges)
        q1, q2 = _simrank2_gate_algebra(edges)
        for k in set(p2) | set(q2):
            assert p1.get(k, 0) == q1.get(k, 0), (k, edges)
            assert p2.get(k, 0) == q2.get(k, 0), (k, edges)


def test_hurst_integer_algebra_matches_direct_rs():
    rng = random.Random(5)
    for _ in range(200):
        xs = [rng.randint(0, 1000) for _ in range(30)]
        for w in (5, 10, 15, 30):
            for chunk in range(30 // w):
                seg = xs[chunk * w : (chunk + 1) * w]
                m = sum(seg) / w
                z = 0.0
                zs = []
                for x in seg:
                    z += x - m
                    zs.append(z)
                r = max(zs) - min(zs)
                s = math.sqrt(sum((x - m) ** 2 for x in seg) / w)
                rs_direct = r / s if s > 0 else 0.0
                cs = 0
                nzs = []
                tot = sum(seg)
                ss = sum(x * x for x in seg)
                for k, x in enumerate(seg, 1):
                    cs += x
                    nzs.append(w * cs - k * tot)
                r_scaled = max(nzs) - min(nzs)
                ss_n = w * ss - tot * tot
                rs_gate = (
                    r_scaled / math.sqrt(ss_n) if ss_n > 0 else 0.0
                )
                assert abs(rs_direct - rs_gate) <= 1e-9 * max(
                    1.0, rs_direct
                )


def test_cramers_v_hand_examples():
    # 2x3 with known chi2 = 20
    obs = {
        ("A", 0): 10,
        ("A", 1): 20,
        ("A", 2): 30,
        ("B", 0): 30,
        ("B", 1): 20,
        ("B", 2): 10,
    }
    r = {"A": 60, "B": 60}
    c = {0: 40, 1: 40, 2: 40}
    n = 120
    chi2_classic = sum(
        (obs[k] - r[k[0]] * c[k[1]] / n) ** 2 / (r[k[0]] * c[k[1]] / n)
        for k in obs
    )
    chi2_gate = sum(
        (obs[k] * n - r[k[0]] * c[k[1]]) ** 2 / (n * r[k[0]] * c[k[1]])
        for k in obs
    )
    assert abs(chi2_classic - 20.0) < 1e-9
    assert abs(chi2_gate - chi2_classic) < 1e-9
    v = math.sqrt(chi2_gate / (n * 1))
    assert abs(v - math.sqrt(20 / 120)) < 1e-12
    # perfect association in a 2x2 -> V = 1 exactly
    chi2p = sum(
        (o * 100 - 50 * 50) ** 2 / (100 * 50 * 50)
        for o in (50, 0, 0, 50)
    )
    assert math.sqrt(chi2p / (100 * 1)) == 1.0


def test_pacf_durbin_levinson_matches_yule_walker():
    import numpy as np

    rng = random.Random(3)
    for _ in range(300):
        xs = [rng.randint(50, 150) for _ in range(30)]
        n = len(xs)
        s = sum(xs)
        d = [n * x - s for x in xs]
        c = [
            sum(d[t] * d[t + k] for t in range(n - k)) for k in range(4)
        ]
        r1, r2, r3 = (c[1] / c[0], c[2] / c[0], c[3] / c[0])
        phi11 = r1
        phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
        phi21 = r1 - phi22 * r1
        phi33 = (r3 - phi21 * r2 - phi22 * r1) / (
            1 - phi21 * r1 - phi22 * r2
        )
        xb = np.mean(xs)
        g = [
            sum((xs[t] - xb) * (xs[t + k] - xb) for t in range(n - k))
            for k in range(4)
        ]
        r = [g[k] / g[0] for k in range(4)]
        for m, gate in ((1, phi11), (2, phi22), (3, phi33)):
            mat = np.array(
                [[r[abs(i - j)] for j in range(m)] for i in range(m)]
            )
            yw = np.linalg.solve(mat, np.array(r[1 : m + 1]))[-1]
            assert abs(gate - yw) <= 1e-8 * max(1.0, abs(yw))


def test_power_iteration_recursion_tracks_numpy_eigvec():
    import numpy as np

    rng = np.random.default_rng(17)
    for _ in range(20):
        # spiked covariance: strong dominant direction
        d = 16
        u = rng.normal(size=d)
        u /= np.linalg.norm(u)
        base = rng.normal(size=(d, d))
        cov = 50.0 * np.outer(u, u) + base @ base.T / d
        # gate recursion: constant start, quantize-once per round
        w1 = cov @ (np.ones(d) * 1000.0)
        v1 = np.round(1000.0 * w1 / np.max(np.abs(w1)))
        w2 = cov @ v1
        v2 = np.round(1e6 * w2 / np.max(np.abs(w2)))
        top = np.linalg.eigh(cov)[1][:, -1]
        cos = abs(np.dot(v2, top)) / (
            np.linalg.norm(v2) * np.linalg.norm(top)
        )
        assert cos > 0.98, cos
        w3 = cov @ v2
        ray = float(v2 @ w3) / float(v2 @ v2)
        lam = np.linalg.eigh(cov)[0][-1]
        assert abs(ray - lam) / lam < 0.05, (ray, lam)


def test_ewma_dyadic_scaled_sum_matches_recurrence():
    rng = random.Random(9)
    for _ in range(200):
        xs = [rng.randint(100, 5000) for _ in range(30)]
        n = len(xs)
        s = sum(xs)
        s2 = sum(x * x for x in xs)
        sigma = math.sqrt(n * s2 - s * s) / n
        z = xs[0]
        for t in range(1, n + 1):
            if t > 1:
                z = xs[t - 1] / 2 + z / 2
            big = xs[0] + sum(
                xs[i - 1] * (1 << (i - 2)) for i in range(2, t + 1)
            )
            zg = big / (1 << (t - 1))
            assert abs(z - zg) <= 1e-9 * max(1, z)
            lim_tb = 3 * sigma * math.sqrt(
                0.5 / 1.5 * (1 - 0.5 ** (2 * t))
            )
            lim_gate = 3 * sigma * math.sqrt(
                (1 - 1 / (1 << (2 * t))) / 3
            )
            assert abs(lim_tb - lim_gate) <= 1e-9 * max(1, lim_tb)


def test_eh_sum_day_mapping_matches_unary_dgim():
    """pipeline49: DGIM over the unary expansion of daily counts, with
    bucket timestamps mapped to days via cumulative-sum intervals,
    must equal the closed form + range join the gate runs."""
    rng = random.Random(21)
    for _ in range(100):
        days = list(range(100, 100 + rng.randint(5, 30)))
        xs = {d: rng.randint(0, 50) for d in days}
        # unary stream: each unit keeps its UNIQUE arrival index (true
        # DGIM total order); days are a reporting granularity applied
        # AFTER the structure is built, exactly as the gate maps unit
        # indices to days via cumulative-sum intervals
        unit_day = [d for d in days for _ in range(xs[d])]
        n = len(unit_day)
        sim_idx = _dgim_sim([(i + 1, True) for i in range(n)])
        sim = [(s, unit_day[idx - 1]) for s, idx in sim_idx]
        # gate algebra: bijective base-2 digits of n; bucket at offset
        # off has its most-recent unit at index n - off (1-based from
        # oldest); its day satisfies cum_{d-1} < idx <= cum_d
        cum = {}
        acc = 0
        for d in days:
            acc += xs[d]
            cum[d] = acc
        cf = []
        k = 0
        pre = 0
        while n and True:
            pw = 1 << k
            if n - (pw - 1) < pw:
                break
            nk = (n - (pw - 1)) // pw
            dk = 2 - (nk % 2)
            for copy in range(1, dk + 1):
                off = pre + (copy - 1) * pw
                idx = n - off
                day = next(
                    d for d in days
                    if cum[d] >= idx and cum[d] - xs[d] < idx
                )
                cf.append((pw, day, off))
            pre += dk * pw
            k += 1
        assert sorted((s, t) for s, t in sim) == sorted(
            (s, t) for s, t, _ in cf
        )
        # estimates agree at several day windows
        sim_off = []
        acc2 = 0
        for s, t in sim:
            sim_off.append((s, t, acc2))
            acc2 += s
        if n:
            for w in (7, 14, 21):
                cutoff = max(days) - w + 1
                assert _dgim_estimate(sim_off, cutoff) == _dgim_estimate(
                    cf, cutoff
                )
