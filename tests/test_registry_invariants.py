"""Registry-level invariants for the driver contract.

Round-2 lesson: queries added after the driver gate ran showed up as
unchecked rows. The registry is frozen early each round and these
invariants keep it gate-clean: every query has an oracle (zero rows-only
entries), every oracle materializes to SQL, and names match — the frozen
count itself lives in test_registry_size_frozen_for_round.
"""

from martial_arts_ocr_spark.queries import (
    ALL_ORACLES,
    ALL_QUERIES,
    materialized_oracles,
)


def test_every_query_has_an_oracle():
    missing = sorted(set(ALL_QUERIES) - set(ALL_ORACLES))
    assert not missing, missing


def test_no_orphan_oracles():
    orphans = sorted(set(ALL_ORACLES) - set(ALL_QUERIES))
    assert not orphans, orphans


def test_oracles_materialize_to_sql():
    mat = materialized_oracles()
    assert set(mat) == set(ALL_ORACLES)
    for name, sql in mat.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_registry_size_frozen_for_round():
    # driver-gate hygiene (VERDICT r2 item 6): grow this ONLY before the
    # gate runs, never after
    assert len(ALL_QUERIES) == 78


# The 50 names the round-6 driver gate blessed (CORRECTNESS_r06.json, all
# green) — under the standing rotation policy, only these may sit past the
# window in round 7, because only they have a driver row exactly one round
# old. Next round this constant becomes the round-7 window.
_R6_DRIVER_BLESSED = set(
    "minhash_bands simhash simhash_neardup_pairs argmax_order "
    "events_sliding_windows events_gap_flags whitespace_normalize "
    "sentence_counts doc_trigram_head custkeys_both_years "
    "region_nation_matrix party_balances_union top_users_per_event_type "
    "part_size_buckets pii_redact doc_stats_by_lang exact_dup_groups "
    "dedup_survivors fingerprints quality_buckets packed_sequences "
    "lm_perplexity_by_lang embedding_quality_scores curation_funnel "
    "packed_epoch_order source_mixing_weights embedding_classifier_eval "
    "corpus_keep_set lm_perplexity_buckets gopher_quality_flags "
    "gopher_line_flags repetition_flags train_val_split "
    "source_quota_sample benchmark_contamination dedup_clusters "
    "media_features audio_features video_features events_asof_purchase "
    "doc_length_percentiles run_metrics run_checkpoints extract_documents "
    "extract_hot_host extract_with_invalid_rows host_profiles "
    "extract_roundtrip extract_ja_segments extract_figures".split()
)


def test_gate_window_membership_pinned():
    """Standing rotation policy (round-4 VERDICT item 1): the driver gate
    audits only the FIRST 50 registry entries, so the ordering rotates each
    round. Pin the round-7 invariants: (a) _GATE_HEAD — last round's tail
    plus this round's new AND semantically-changed queries — leads the
    registry, inside the window; (b) every query PAST the window has a
    driver-green row exactly one round old (it was in round 6's audited
    window)."""
    from martial_arts_ocr_spark.queries import _GATE_HEAD

    names = list(ALL_QUERIES)
    window = set(names[:50])
    assert set(_GATE_HEAD) <= window, sorted(set(_GATE_HEAD) - window)
    assert names[:len(_GATE_HEAD)] == _GATE_HEAD
    ungated = set(names[50:])
    assert ungated <= _R6_DRIVER_BLESSED, sorted(ungated - _R6_DRIVER_BLESSED)
    # rotation sanity: nothing is BOTH head and past-window, and the tail
    # size is exactly len(registry) - 50
    assert not (set(_GATE_HEAD) & ungated)
    assert len(ungated) == max(0, len(names) - 50)
