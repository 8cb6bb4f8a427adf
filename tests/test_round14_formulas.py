"""Independent pure-Python replicas locking the round-14 stats gates'
algebra (the r13 formula-review discipline: a mirrored-wrong formula
passes every oracle gate, so each new statistic is checked against an
INDEPENDENT implementation, not the hash)."""

from __future__ import annotations

import random
from collections import deque
from fractions import Fraction


# ------------------------------------------------------------ MTLD --


def mtld_textbook(tokens: list[str], threshold: float = 0.72):
    """McCarthy-Jarvis forward MTLD, straight from the definition:
    running TTR of the current factor, factor completes when TTR drops
    strictly below the threshold, partial factor (1 - TTR)/(1 - thr).
    Returns (factors, partial) — MTLD = n / (factors + partial)."""
    factors = 0
    types: set[str] = set()
    count = 0
    for t in tokens:
        types.add(t)
        count += 1
        if len(types) / count < threshold:
            factors += 1
            types = set()
            count = 0
    partial = 0.0 if count == 0 else (1 - len(types) / count) / (1 - threshold)
    return factors, count, len(types), partial


def mtld_gate_recurrence(tokens: list[str]):
    """Exact transcription of the pipeline51 SQL state machine:
    integer test 100*(ty + new) < 72*(tok + 1), list-membership type
    tracking. Returns (f, ty, tok) end state."""
    f, ty, tok, cur = 0, 0, 0, []
    for t in tokens:
        new = 0 if t in cur else 1
        if 100 * (ty + new) < 72 * (tok + 1):
            f, ty, tok, cur = f + 1, 0, 0, []
        else:
            ty, tok = ty + new, tok + 1
            if new:
                cur.append(t)
    return f, ty, tok


def test_mtld_recurrence_matches_textbook():
    rng = random.Random(1451)
    for trial in range(300):
        vocab = [f"w{i}" for i in range(rng.randint(2, 40))]
        n = rng.randint(1, 150)
        toks = [rng.choice(vocab) for _ in range(n)]
        f, ty, tok = mtld_gate_recurrence(toks)
        tf, ttok, tty, tpartial = mtld_textbook(toks)
        assert f == tf, (trial, toks)
        assert tok == ttok and ty == tty, (trial, toks)
        # the gate's partial expression (tok - ty)/tok / 0.28 equals
        # the textbook (1 - TTR)/(1 - 0.72) as exact rationals
        if tok > 0:
            gate_partial = Fraction(tok - ty, tok) / Fraction(28, 100)
            text_partial = (1 - Fraction(tty, ttok)) / (
                1 - Fraction(72, 100)
            )
            assert gate_partial == text_partial
        # the integer threshold test is exactly TTR < 0.72: 0.72 is
        # 72/100, so 100*ty < 72*tok <=> ty/tok < 0.72 for tok > 0
        # (exercised implicitly by the factor-count equality above)


# ------------------------------------------------------- FIR CUSUM --


def cusum_fir_float(xs: list[int]):
    """Textbook Lucas-Crosier FIR CUSUM in exact Fractions: mean
    target, slack k = floor(sum/8)/n, threshold h = 4k, FIR start
    h/2. Returns per-chart (final, max, alarm_index) where alarm is
    the first i with s_i > h (1-based), -1 if none."""
    n = len(xs)
    tot = sum(xs)
    mean = Fraction(tot, n)
    k = Fraction(tot // 8, n)  # the gate's K = tot DIV 8, n-scaled down
    h = 4 * k

    def run(s0):
        s, smax, alarm = s0, s0, -1
        for i, x in enumerate(xs, 1):
            s = max(Fraction(0), s + (x - mean) - k)
            smax = max(smax, s)
            if alarm == -1 and s > h:
                alarm = i
        return s, smax, alarm

    return run(h / 2), run(Fraction(0)), h


def cusum_fir_gate(xs: list[int]):
    """Exact transcription of the pipeline51 integer recurrence:
    n-scaled devs d = c*n - tot, K = tot DIV 8, H = 4K, FIR start
    2K."""
    n = len(xs)
    tot = sum(xs)
    K = tot // 8
    H = 4 * K

    def run(s0):
        s, smax, alarm = s0, s0, -1
        for i, x in enumerate(xs, 1):
            s = max(0, s + (x * n - tot) - K)
            smax = max(smax, s)
            if alarm == -1 and s > H:
                alarm = i
        return s, smax, alarm

    return run(2 * K), run(0), H


def test_cusum_fir_integer_scaling_exact():
    """The gate's bigint recurrence is the textbook chart scaled by n:
    s_int == n * s_frac at every step, alarms on the same day."""
    rng = random.Random(1452)
    for trial in range(300):
        n = rng.randint(5, 40)
        xs = [rng.randint(0, 500) for _ in range(n)]
        if sum(xs) == 0:
            xs[0] = 1
        (ff, fm, fa), (sf_, sm, sa), h = cusum_fir_float(xs)
        (gf, gm, ga), (gsf, gsm, gsa), H = cusum_fir_gate(xs)
        assert Fraction(gf) == n * ff and Fraction(gm) == n * fm
        assert Fraction(gsf) == n * sf_ and Fraction(gsm) == n * sm
        assert ga == fa and gsa == sa, (trial, xs)
        assert Fraction(H) == n * h
        # FIR never alarms later than standard (same threshold,
        # head start only adds)
        if gsa != -1:
            assert ga != -1 and ga <= gsa


# ------------------------------------- sliding-max deque closed form --


def sliding_max_deque_real(xs: list[int], w: int):
    """REAL monotonic-deque maintenance (strict eviction: pop all
    back items <= new), per window end: (max, deque as list of
    (idx, val) front..back)."""
    dq: deque[int] = deque()  # indices, values strictly decreasing
    out = []
    for i, x in enumerate(xs):
        while dq and xs[dq[-1]] <= x:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - w:
            dq.popleft()
        if i >= w - 1:
            out.append((xs[dq[0]], [(j, xs[j]) for j in dq]))
    return out


def sliding_max_closed_form(xs: list[int], w: int):
    """The pipeline51 membership predicate: j in window is a deque
    member iff x_j > max(x_k for k in (j, e])."""
    out = []
    for e in range(w - 1, len(xs)):
        members = []
        for j in range(e - w + 1, e + 1):
            later = xs[j + 1 : e + 1]
            if not later or xs[j] > max(later):
                members.append((j, xs[j]))
        out.append((max(x for _, x in members), members))
    return out


def test_sliding_max_closed_form_matches_real_deque():
    rng = random.Random(1453)
    for trial in range(200):
        n = rng.randint(14, 60)
        w = rng.choice([3, 7, 14])
        # duplicate-heavy values to exercise the tie convention
        xs = [rng.randint(0, 9) for _ in range(n)]
        assert sliding_max_closed_form(xs, w) == sliding_max_deque_real(
            xs, w
        ), (trial, w, xs)


def test_sliding_max_front_is_latest_argmax():
    """Strict eviction means the deque front is the LATEST argmax —
    the convention the gate's argmax_day column documents."""
    rng = random.Random(1454)
    for _ in range(100):
        n = rng.randint(14, 40)
        xs = [rng.randint(0, 5) for _ in range(n)]
        for e_off, (mx, members) in enumerate(
            sliding_max_closed_form(xs, 14)
        ):
            e = e_off + 13
            window = xs[e - 13 : e + 1]
            assert mx == max(window)
            front_idx = members[0][0]
            latest_argmax = max(
                j for j in range(e - 13, e + 1) if xs[j] == mx
            )
            assert front_idx == latest_argmax


# --------------------------------------------- SimRank round 3 --


def _simrank3_textbook(edges):
    """Textbook SimRank with the gate's ppm quantization, 3 rounds."""
    import itertools

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    deg = {u: len(adj[u]) for u in nodes}

    prev = {}  # s0 off-diagonal = 0

    def sf(s, i, j):
        if i == j:
            return 1000000
        return s.get((min(i, j), max(i, j)), 0)

    rounds = []
    for _ in range(3):
        cur = {}
        for a, b in itertools.combinations(nodes, 2):
            t = sum(sf(prev, i, j) for i in adj[a] for j in adj[b])
            cur[(a, b)] = (4 * t) // (5 * deg[a] * deg[b])
        rounds.append(cur)
        prev = cur
    return rounds


def _simrank3_gate_algebra(edges):
    """Replays pipeline40._SR_CHAIN_SQL + pipeline52._SR3_EXT_SQL
    join-by-join (support sets evolve exactly as the SQL's
    common/cross FULL OUTER JOINs do)."""
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

    def propagate(s_prev):
        sx = {}
        for (a, b), s in s_prev.items():
            sx[(a, b)] = s
            sx[(b, a)] = s
        cross = {}
        for (i, j), s in sx.items():
            for (u1, a) in adj:
                if u1 != i:
                    continue
                for (u2, b) in adj:
                    if u2 != j:
                        continue
                    if a < b:
                        cross[(a, b)] = cross.get((a, b), 0) + s
        nxt = {}
        for k in set(common) | set(cross):
            t = 1000000 * common.get(k, 0) + cross.get(k, 0)
            nxt[k] = (4 * t) // (5 * deg[k[0]] * deg[k[1]])
        return nxt

    s2 = propagate(s1)
    s3 = propagate(s2)
    return s1, s2, s3


def test_simrank3_gate_algebra_matches_textbook():
    rng = random.Random(1455)
    for _ in range(100):
        n = rng.randint(4, 9)
        nodes = [f"n{i}" for i in range(n)]
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(rng.randint(3, 14))
            }
        )
        p1, p2, p3 = _simrank3_textbook(edges)
        q1, q2, q3 = _simrank3_gate_algebra(edges)
        for k in set(p3) | set(q3):
            assert p1.get(k, 0) == q1.get(k, 0), (k, edges)
            assert p2.get(k, 0) == q2.get(k, 0), (k, edges)
            assert p3.get(k, 0) == q3.get(k, 0), (k, edges)


# ------------------------------------------------- Cohen's kappa --


def test_kappa_integer_fraction_matches_definition():
    """The gate's n^2-scaled integer fraction equals the textbook
    kappa = (po - pe)/(1 - pe) as exact rationals."""
    rng = random.Random(1456)
    for _ in range(300):
        n = rng.randint(2, 200)
        ra = [rng.randint(0, 1) for _ in range(n)]
        rb = [rng.randint(0, 1) for _ in range(n)]
        agree = sum(1 for a, b in zip(ra, rb) if a == b)
        ra0 = ra.count(0)
        rb0 = rb.count(0)
        po = Fraction(agree, n)
        pe = Fraction(ra0 * rb0 + (n - ra0) * (n - rb0), n * n)
        num = n * agree - (ra0 * rb0 + (n - ra0) * (n - rb0))
        den = n * n - (ra0 * rb0 + (n - ra0) * (n - rb0))
        if pe == 1:
            assert den == 0
            continue
        assert Fraction(num, den) == (po - pe) / (1 - pe)


# ------------------------------------------------ Kendall tau-b --


def _taub_pair_counts(xs, ys):
    """The gate's pair-counting formulation."""
    n = len(xs)
    conc = disc = tx = ty = txy = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[i] - xs[j], ys[i] - ys[j]
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
            elif dx == 0 and dy == 0:
                txy += 1
            elif dx == 0:
                tx += 1
            else:
                ty += 1
    n0 = n * (n - 1) // 2
    return conc, disc, tx, ty, txy, n0


def test_taub_pair_counts_match_groupwise_tie_formula():
    """n0 - tie_x - tie_xy must equal n0 - sum t_i(t_i-1)/2 over x
    groups (the textbook tau-b denominator factor), same for y —
    locking the pair-level tie classification against the groupwise
    definition."""
    from collections import Counter

    rng = random.Random(1457)
    for _ in range(300):
        n = rng.randint(2, 40)
        xs = [rng.randint(0, 6) for _ in range(n)]
        ys = [rng.randint(0, 6) for _ in range(n)]
        conc, disc, tx, ty, txy, n0 = _taub_pair_counts(xs, ys)
        n1 = sum(c * (c - 1) // 2 for c in Counter(xs).values())
        n2 = sum(c * (c - 1) // 2 for c in Counter(ys).values())
        assert tx + txy == n1
        assert ty + txy == n2
        # and C - D is antisymmetric sign-count by definition
        cd = sum(
            (1 if (xs[i] - xs[j]) * (ys[i] - ys[j]) > 0 else 0)
            - (1 if (xs[i] - xs[j]) * (ys[i] - ys[j]) < 0 else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        assert conc - disc == cd


# ------------------------------------------- partial correlation --


def test_partial_corr_matches_residual_definition():
    """r_xy.z composed from pairwise r's must equal the correlation
    of OLS residuals of x on z and y on z (the defining property),
    checked in floats to 1e-9 on random integer series."""
    import math

    rng = random.Random(1458)
    done = 0
    while done < 200:
        n = rng.randint(5, 30)
        xs = [rng.randint(0, 50) for _ in range(n)]
        ys = [rng.randint(0, 50) for _ in range(n)]
        zs = [rng.randint(0, 50) for _ in range(n)]

        def corr(a, b):
            na = len(a)
            sa, sb = sum(a), sum(b)
            sab = sum(p * q for p, q in zip(a, b))
            saa = sum(p * p for p in a)
            sbb = sum(q * q for q in b)
            va = na * saa - sa * sa
            vb = na * sbb - sb * sb
            if va <= 0 or vb <= 0:
                return None
            return (na * sab - sa * sb) / math.sqrt(va * vb)

        rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
        if rxy is None or rxz is None or ryz is None:
            continue
        if 1 - rxz * rxz <= 1e-12 or 1 - ryz * ryz <= 1e-12:
            continue
        gate = (rxy - rxz * ryz) / (
            math.sqrt(1 - rxz * rxz) * math.sqrt(1 - ryz * ryz)
        )

        # residual-correlation definition
        def residuals(a, c):
            na = len(a)
            beta = (na * sum(p * q for p, q in zip(a, c)) - sum(a) * sum(c)) / (
                na * sum(q * q for q in c) - sum(c) ** 2
            )
            alpha = (sum(a) - beta * sum(c)) / na
            return [p - alpha - beta * q for p, q in zip(a, c)]

        ex, ey = residuals(xs, zs), residuals(ys, zs)
        ref = corr2 = None
        sx = sum(ex) / n
        sy = sum(ey) / n
        num = sum((p - sx) * (q - sy) for p, q in zip(ex, ey))
        dx = math.sqrt(sum((p - sx) ** 2 for p in ex))
        dy = math.sqrt(sum((q - sy) ** 2 for q in ey))
        if dx <= 1e-9 or dy <= 1e-9:
            continue
        ref = num / (dx * dy)
        assert abs(gate - ref) < 1e-9, (xs, ys, zs)
        done += 1


# -------------------------------------- Grubbs / overdispersion --


def test_grubbs_integer_scaling_matches_definition():
    """maxdev / sqrt(n*ss_n/(n-1)) equals max|x - mean|/s as exact
    rationals-under-sqrt: G^2 * (n-1) * ss_n == n * (n-1)^2 ... —
    checked via Fraction equality of G^2."""
    rng = random.Random(1459)
    for _ in range(300):
        n = rng.randint(3, 40)
        xs = [rng.randint(0, 300) for _ in range(n)]
        S = sum(xs)
        Q = sum(x * x for x in xs)
        ss_n = n * Q - S * S
        if ss_n == 0:
            continue
        maxdev = max(abs(n * x - S) for x in xs)
        # gate: G^2 = maxdev^2 * (n-1) / (n * ss_n)
        gate_g2 = Fraction(maxdev * maxdev * (n - 1), n * ss_n)
        mean = Fraction(S, n)
        s2 = sum((Fraction(x) - mean) ** 2 for x in xs) / (n - 1)
        direct_g2 = max((Fraction(x) - mean) ** 2 for x in xs) / s2
        assert gate_g2 == direct_g2


def test_overdispersion_exact_fraction_matches_definition():
    """(nQ - S^2)/S equals (n-1)*s^2/mean as exact rationals."""
    rng = random.Random(1460)
    for _ in range(300):
        n = rng.randint(2, 40)
        xs = [rng.randint(0, 300) for _ in range(n)]
        S = sum(xs)
        if S == 0:
            continue
        Q = sum(x * x for x in xs)
        gate = Fraction(n * Q - S * S, S)
        mean = Fraction(S, n)
        s2 = sum((Fraction(x) - mean) ** 2 for x in xs) / (n - 1)
        assert gate == (n - 1) * s2 / mean


# ----------------------------------------- RQA / Gini / ordinal --


def test_rqa_counts_match_bruteforce():
    """Recurrence and determinism counts vs a direct double-loop
    replica with the same eps = range // 10 rule."""
    rng = random.Random(1461)
    for _ in range(200):
        n = rng.randint(5, 30)
        xs = [rng.randint(0, 40) for _ in range(n)]
        eps = (max(xs) - min(xs)) // 10
        rec = set()
        for i in range(n):
            for j in range(i + 1, n):
                if abs(xs[i] - xs[j]) <= eps:
                    rec.add((i, j))
        det = {
            (i, j)
            for (i, j) in rec
            if (i + 1, j + 1) in rec or (i - 1, j - 1) in rec
        }
        # SQL-side invariants the gate emits
        total = n * (n - 1) // 2
        assert len(det) <= len(rec) <= total
        # diagonal membership is symmetric in the predecessor/
        # successor test: every det pair has a diagonal neighbour
        for (i, j) in det:
            assert (i + 1, j + 1) in rec or (i - 1, j - 1) in rec


def test_perm_entropy_patterns_valid_and_impossible_slots_zero():
    """Pattern id 4*[a<=b] + 2*[a<=c] + [b<=c]: slots 2 (010) and 5
    (101) are transitivity-impossible; the 6 valid slots biject with
    the 6 orderings under the stable tie convention."""
    rng = random.Random(1462)
    seen = set()
    for _ in range(2000):
        a, b, c = (rng.randint(0, 4) for _ in range(3))
        pat = (
            4 * (1 if a <= b else 0)
            + 2 * (1 if a <= c else 0)
            + (1 if b <= c else 0)
        )
        assert pat not in (2, 5), (a, b, c)
        seen.add(pat)
    assert seen == {0, 1, 3, 4, 6, 7}


def test_length_gini_tie_order_invariant_and_matches_definition():
    """The sorted-formula Gini with (value, id) total order equals
    the mean-absolute-difference definition G = sum|xi - xj| /
    (2 n^2 mu) ... as exact rationals, and is invariant to how tied
    values are ranked."""
    rng = random.Random(1463)
    for _ in range(200):
        n = rng.randint(2, 30)
        xs = [rng.randint(0, 20) for _ in range(n)]
        S = sum(xs)
        if S == 0:
            continue
        srt = sorted(xs)
        w = sum((2 * (i + 1) - 1) * x for i, x in enumerate(srt))
        gate = Fraction(w - n * S, n * S)
        mad = sum(
            abs(xi - xj) for xi in xs for xj in xs
        )  # includes both orders and self-pairs (0)
        ref = Fraction(mad, 2 * n * S)
        assert gate == ref, (xs, gate, ref)
        # tie-order invariance: shuffle equal values' positions
        srt2 = sorted(xs, key=lambda x: (x, rng.random()))
        w2 = sum((2 * (i + 1) - 1) * x for i, x in enumerate(srt2))
        assert w2 == w


# -------------------------------------------- transfer entropy --


def test_transfer_entropy_cell_formula_matches_definition():
    """The gate's cell/marginal composition equals the conditional-
    probability definition TE = sum p(a,b,c) ln[p(a|b,c)/p(a|b)],
    and TE >= 0 always (Jensen), checked on random binary series."""
    import math

    rng = random.Random(1464)
    for _ in range(300):
        n = rng.randint(6, 40)
        ys = [rng.randint(0, 1) for _ in range(n)]
        xs = [rng.randint(0, 1) for _ in range(n)]
        cells = {}
        for d in range(n - 1):
            k = (ys[d + 1], ys[d], xs[d])
            cells[k] = cells.get(k, 0) + 1
        N = n - 1

        def c(a, b, cc):
            return cells.get((a, b, cc), 0)

        gate = 0.0
        for a in (0, 1):
            for b in (0, 1):
                for cc in (0, 1):
                    v = c(a, b, cc)
                    if v == 0:
                        continue
                    m = c(0, b, cc) + c(1, b, cc)
                    g = c(a, b, 0) + c(a, b, 1)
                    h = sum(
                        c(x, b, y) for x in (0, 1) for y in (0, 1)
                    )
                    gate += (v / N) * math.log(v * h / (m * g))
        # definition via conditional probabilities
        ref = 0.0
        for a in (0, 1):
            for b in (0, 1):
                for cc in (0, 1):
                    v = c(a, b, cc)
                    if v == 0:
                        continue
                    p_abc = v / N
                    m = c(0, b, cc) + c(1, b, cc)
                    g = c(a, b, 0) + c(a, b, 1)
                    h = sum(
                        c(x, b, y) for x in (0, 1) for y in (0, 1)
                    )
                    p_a_given_bc = v / m
                    p_a_given_b = g / h
                    ref += p_abc * math.log(p_a_given_bc / p_a_given_b)
        assert abs(gate - ref) < 1e-12
        assert gate > -1e-12  # non-negativity (Jensen)


# ------------------------------------- laminarity / min-deque --


def test_rqa_laminarity_counts_match_bruteforce():
    """Ordered-pair recurrence + vertical-neighbor laminarity vs a
    direct double-loop replica."""
    rng = random.Random(1465)
    for _ in range(200):
        n = rng.randint(5, 30)
        xs = [rng.randint(0, 40) for _ in range(n)]
        eps = (max(xs) - min(xs)) // 10
        rec = {
            (i, j)
            for i in range(n)
            for j in range(n)
            if i != j and abs(xs[i] - xs[j]) <= eps
        }
        lam = {
            (i, j)
            for (i, j) in rec
            if (i, j + 1) in rec or (i, j - 1) in rec
        }
        assert len(lam) <= len(rec) <= n * (n - 1)
        # symmetry of the ordered recurrence set
        assert all((j, i) in rec for (i, j) in rec)


def sliding_min_deque_real(xs, w):
    """REAL monotonic min-deque maintenance (strict eviction: pop
    all back items >= new)."""
    from collections import deque as dq_

    dq = dq_()
    out = []
    for i, x in enumerate(xs):
        while dq and xs[dq[-1]] >= x:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - w:
            dq.popleft()
        if i >= w - 1:
            out.append((xs[dq[0]], [(j, xs[j]) for j in dq]))
    return out


def sliding_min_closed_form(xs, w):
    """pipeline60 membership: j in window is a member iff
    x_j < min(x_k for k in (j, e])."""
    out = []
    for e in range(w - 1, len(xs)):
        members = []
        for j in range(e - w + 1, e + 1):
            later = xs[j + 1 : e + 1]
            if not later or xs[j] < min(later):
                members.append((j, xs[j]))
        out.append((min(x for _, x in members), members))
    return out


def test_sliding_min_closed_form_matches_real_deque():
    rng = random.Random(1466)
    for trial in range(200):
        n = rng.randint(14, 60)
        w = rng.choice([3, 7, 14])
        xs = [rng.randint(0, 9) for _ in range(n)]
        assert sliding_min_closed_form(xs, w) == sliding_min_deque_real(
            xs, w
        ), (trial, w, xs)


# ------------------------------------------- trapping time --


def test_rqa_trapping_runs_match_bruteforce():
    """Vertical-run extraction (gaps-and-islands over ordered
    recurrence pairs, LOI exclusion splitting runs) vs a direct
    scan replica."""
    rng = random.Random(1467)
    for _ in range(200):
        n = rng.randint(5, 30)
        xs = [rng.randint(0, 40) for _ in range(n)]
        eps = (max(xs) - min(xs)) // 10
        rec = {
            (i, j)
            for i in range(n)
            for j in range(n)
            if i != j and abs(xs[i] - xs[j]) <= eps
        }
        # direct scan: for each anchor i, maximal runs of consecutive j
        runs = []
        for i in range(n):
            js = sorted(j for (a, j) in rec if a == i)
            start = None
            prev = None
            for j in js + [None]:
                if prev is not None and j is not None and j == prev + 1:
                    prev = j
                    continue
                if start is not None:
                    runs.append(prev - start + 1)
                start, prev = j, j
        runs2 = [r for r in runs if r >= 2]
        # gaps-and-islands replica (the SQL's j - row_number grouping)
        gi_runs = []
        for i in range(n):
            js = sorted(j for (a, j) in rec if a == i)
            groups = {}
            for rnk, j in enumerate(js, 1):
                groups.setdefault(j - rnk, []).append(j)
            gi_runs.extend(len(v) for v in groups.values())
        gi_runs2 = [r for r in gi_runs if r >= 2]
        assert sorted(runs2) == sorted(gi_runs2), (xs,)
        assert sum(runs2) == sum(gi_runs2)


# ------------------------------------------- weekend dow mapping --


def test_weekend_dow_mapping_against_calendar():
    """(day + 3) % 7 maps epoch days to Sat=5/Sun=6 — checked against
    datetime.date over several years (the round-diff review caught an
    off-by-one (day+4) spelling that flagged Fri+Sat, mirrored in
    both engines)."""
    import datetime

    epoch = datetime.date(1970, 1, 1)
    for day in range(0, 3000, 7):
        for off in range(7):
            d = epoch + datetime.timedelta(days=day + off)
            is_weekend = d.weekday() >= 5  # Mon=0 ... Sun=6
            gate = ((day + off + 3) % 7) >= 5
            assert gate == is_weekend, (d, d.weekday())
