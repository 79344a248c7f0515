"""Tenth-session r5 operators: winnowing fingerprints (python-reference
equality + the MOSS shared-substring guarantee), CUSUM changepoint
(planted mean shift + exact integer reference), chi-squared independence
(zero on an independent table, python reference on a dependent one), and
association rules (hand-computed supports/confidence/lift)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import __spark_entry__ as entry


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


# ── winnowing ────────────────────────────────────────────────────────────────


def _winnow_ref(text: str, k: int = 5, w: int = 8) -> set[tuple[int, int]]:
    toks = text.lower().strip().split(" ")
    if len(toks) < k:
        return set()
    enc = []
    for i in range(len(toks) - k + 1):
        gram = " ".join(toks[i : i + k])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)
        enc.append(h * 1048576 + i)
    sel = {min(enc[j : j + w]) for j in range(max(len(enc) - w, 0) + 1)}
    return {(e % 1048576, e // 1048576) for e in sel}


def test_text_winnowing_matches_python_reference(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "a b c d e f g h i j k l m n o p q r s t",
        "one two three four five",  # exactly k tokens -> 1 gram, 1 window
        "too short here",  # < k tokens -> no rows
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got: dict[int, set[tuple[int, int]]] = {}
    for r in entry.queries()["text_winnowing"](spark, d).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(texts):
        want = _winnow_ref(t)
        assert got.get(i, set()) == want, f"doc {i}"
    assert 3 not in got  # sub-k doc contributes nothing


def test_text_winnowing_shared_substring_guarantee(spark, tmp_path):
    # MOSS guarantee: any shared run of >= t = w + k - 1 = 12 tokens must
    # yield at least one common fingerprint HASH between the two docs.
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    assert len(shared.split()) == 12
    t1 = "xx yy " + shared + " zz"
    t2 = shared + " aa bb cc dd ee"
    df = spark.createDataFrame(
        [(1, t1, "en", "s", 0), (2, t2, "en", "s", 0)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    fps: dict[int, set[int]] = {1: set(), 2: set()}
    for r in entry.queries()["text_winnowing"](spark, d).collect():
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2], "shared 12-token run produced no common fingerprint"


# ── CUSUM ────────────────────────────────────────────────────────────────────


def test_events_cusum_finds_planted_shift(spark, tmp_path):
    # 10 days at mean 10.00, then 10 days at mean 20.00, 4 events/day:
    # |CUSUM| peaks exactly at the last pre-shift day.
    rows = []
    eid = 0
    for day in range(1, 21):
        v = 10.0 if day <= 10 else 20.0
        for j in range(4):
            rows.append(
                (eid, dt.datetime(2024, 1, day, j), 7, "shift", v, "{}")
            )
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    [r] = entry.queries()["events_cusum"](spark, d).collect()
    assert r.event_type == "shift"
    assert r.cp_day == "2024-01-10"
    assert r.n_total == 80
    # exact integer reference: daily s1/n in cents, dev = s1*N - S*n
    daily = [(4, 4 * (1000 if day <= 10 else 2000)) for day in range(1, 21)]
    N = sum(n for n, _ in daily)
    S = sum(s for _, s in daily)
    cum, best = 0, None
    for i, (n, s1) in enumerate(daily, 1):
        cum += s1 * N - S * n
        if best is None or abs(cum) > abs(best[1]):
            best = (i, cum)
    assert best[0] == 10 and r.cusum == best[1]


# ── chi-squared ──────────────────────────────────────────────────────────────


def test_events_chisq_zero_when_independent(spark, tmp_path):
    # identical daily profile for every type over exactly two weeks ->
    # every cell equals its expectation -> chi2 == 0.0
    rows = []
    eid = 0
    for day in range(1, 15):
        for t in ["a", "b"]:
            for j in range(3):
                rows.append((eid, dt.datetime(2024, 1, day, j), 1, t, 1.0, "{}"))
                eid += 1
    d = _write_events(spark, tmp_path, rows)
    [r] = entry.queries()["events_chisq"](spark, d).collect()
    assert r.chi2 == 0.0 and r.dof == 6 and r.n_cells == 14 and r.n_events == 84


def test_events_chisq_matches_python_reference(spark, tmp_path):
    rows = []
    eid = 0
    # dependence: type "wk" only on some dows, "all" everywhere
    for day in range(1, 29):
        dowday = (dt.date(2024, 1, day) - dt.date(1970, 1, 1)).days % 7
        for j in range(2):
            rows.append((eid, dt.datetime(2024, 1, day, j), 1, "all", 1.0, "{}"))
            eid += 1
        if dowday in (0, 1, 2):
            rows.append((eid, dt.datetime(2024, 1, day, 5), 1, "wk", 1.0, "{}"))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    [r] = entry.queries()["events_chisq"](spark, d).collect()
    # python reference over the identical cells / quantization
    from collections import Counter

    cells = Counter()
    for row in rows:
        # naive epoch arithmetic — the session tz is UTC, so Spark's
        # unix_timestamp sees the identical wall-clock epoch
        dow = (
            int((row[1] - dt.datetime(1970, 1, 1)).total_seconds()) // 86400 % 7
        )
        cells[(row[3], dow)] += 1
    rt = Counter()
    ct = Counter()
    for (t, dow), o in cells.items():
        rt[t] += o
        ct[dow] += o
    n = sum(cells.values())
    chi_u = sum(
        math.floor(
            (o * n - rt[t] * ct[dow]) ** 2 / (n * rt[t] * ct[dow]) * 1000000.0
            + 0.5
        )
        for (t, dow), o in cells.items()
    )
    assert r.chi2 == round(chi_u / 1000000.0, 4)
    assert r.dof == (2 - 1) * (len(ct) - 1)


# ── association rules ────────────────────────────────────────────────────────


def test_events_assoc_rules_known_answer(spark, tmp_path):
    # 4 baskets: {v,c,p}, {v,c}, {v}, {c,p} (repeat events collapse)
    baskets = [
        (1, 1, ["view", "click", "purchase", "view"]),
        (2, 1, ["view", "click"]),
        (3, 1, ["view"]),
        (4, 2, ["click", "purchase", "purchase"]),
    ]
    rows = []
    eid = 0
    for u, day, items in baskets:
        for it in items:
            rows.append((eid, dt.datetime(2024, 1, day, eid % 24), u, it, 1.0, "{}"))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r.item_a, r.item_b): r
        for r in entry.queries()["events_assoc_rules"](spark, d).collect()
    }
    # supports: view 3, click 3, purchase 2; n_baskets 4
    r = got[("click", "view")]
    assert (r.supp_ab, r.supp_a, r.supp_b, r.n_baskets) == (2, 3, 3, 4)
    assert r.conf_ab == round(2 / 3, 4) and r.lift == round(2 * 4 / 9, 4)
    r = got[("click", "purchase")]
    assert (r.supp_ab, r.supp_a, r.supp_b) == (2, 3, 2)
    assert r.conf_ba == 1.0 and r.lift == round(2 * 4 / 6, 4)
    r = got[("purchase", "view")]
    assert r.supp_ab == 1 and r.lift == round(1 * 4 / 6, 4)
    assert len(got) == 3
