"""Guard against the silent driver-window overflow found in round 4.

The per-round correctness driver checks EXACTLY the first 50 entries of
``queries()`` (verified: the CORRECTNESS_r03/r04 key lists both equal
``queries()[:50]``).  In round 4 seven entries drifted past position 50
and silently received no driver evidence.  These tests pin the rotation
policy: anything outside the window must already be driver-certified
green in a prior round's artifact, and never-certified queries must sit
inside the window.  No SparkSession needed — pure dict/JSON checks.
"""
import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _query_names():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries().keys()), set(mod.oracle_sql().keys())


def _green_ever():
    """Names with a fully green row in ANY round's CORRECTNESS artifact.

    ``hash_match`` may legitimately be null/absent for rows-only
    entries; for those, green means rows_match (the driver's weaker
    check) — but rows-only entries are separately required to sit
    inside the window by test_never_certified_inside_window.
    """
    green = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            art = json.load(open(path))
        except Exception:
            continue
        for name, row in art.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            if row.get("rows_match") and row.get("schema_match", True) \
                    and row.get("hash_match", True) is not False:
                green.add(name)
    return green


def test_tail_entries_all_previously_driver_green():
    names, _ = _query_names()
    tail = names[WINDOW:]
    green = _green_ever()
    never_certified = [n for n in tail if n not in green]
    assert not never_certified, (
        f"queries() entries past position {WINDOW} have never had a green "
        f"driver CORRECTNESS row and will get NO driver evidence this "
        f"round: {never_certified}. Move them inside the first {WINDOW} "
        f"entries (rotate long-stable green queries to the tail instead).")


def test_every_query_has_oracle_or_is_allowlisted():
    # rows-only entries (non-SQL-expressible) — keep this list explicit
    # so a missing oracle is a decision, not an accident.
    ROWS_ONLY = {"outlier_validate"}
    names, oracled = _query_names()
    missing = [n for n in names if n not in oracled and n not in ROWS_ONLY]
    assert not missing, (
        f"queries() entries without an oracle_sql() twin and not on the "
        f"rows-only allowlist: {missing}")
    stale = ROWS_ONLY - set(names)
    assert not stale, f"rows-only allowlist names unknown queries: {stale}"


def test_rows_only_entries_inside_window():
    # rows-only entries get only the weaker rows-count driver check, so
    # they must never fall out of the window (they have no other gate).
    names, oracled = _query_names()
    tail = set(names[WINDOW:])
    rows_only_in_tail = [n for n in names
                         if n not in oracled and n in tail]
    assert not rows_only_in_tail, (
        f"rows-only queries outside the driver window: {rows_only_in_tail}")


def test_recently_changed_queries_inside_window():
    """Queries whose backing code changed THIS round must sit inside the
    driver's 50-entry window so CORRECTNESS_r05 certifies the change —
    prior-round green rows satisfy the tail guard but say nothing about
    this round's code.  Update the list each round to name the queries
    whose operators were touched."""
    CHANGED_THIS_ROUND = [
        # CC fast path + collapse-exact clustering (round 5)
        "dedup_clusters", "canonical_docs", "dedup_clusters_collapsed",
        # new round-5 operators
        "gopher_rules", "gopher_repetition", "bigram_lm",
        "curation_pipeline", "resample_mix", "mix_weights",
        "perplexity_buckets", "url_blocklist", "unigram_lm_head",
        "span_dedup", "outlier_validate_root", "pack_sequences",
        "tfidf_top_terms", "novelty_scores",
    ]
    names, _ = _query_names()
    window = set(names[:WINDOW])
    outside = [n for n in CHANGED_THIS_ROUND if n not in window]
    assert not outside, (
        f"queries changed this round sit outside the driver's "
        f"{WINDOW}-entry window and get no fresh CORRECTNESS row: "
        f"{outside}")
