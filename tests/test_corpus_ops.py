"""Behavioral/property tests for the round-2 corpus operators: the
oracle parity suite proves value equality; these pin the semantic
invariants that survive any refactor of the expressions."""

from __future__ import annotations

from reports_generator_spark.plans import registry

from conftest import SF_DIR

registry.load_all()


def test_shuffle_shard_is_a_permutation(spark):
    """Every document appears exactly once; positions within a shard
    are 1..n_shard contiguous; the assignment is deterministic across
    invocations."""
    out = registry.QUERIES["corpus_shuffle_shard"](spark, SF_DIR).collect()
    docs = [r["doc_id"] for r in out]
    assert len(docs) == len(set(docs))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    again = registry.QUERIES["corpus_shuffle_shard"](spark, SF_DIR).collect()
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in out} == {
        (r["doc_id"], r["shard"], r["pos"]) for r in again
    }


def test_shuffle_shard_breaks_id_order(spark):
    """The whole point is decorrelating training order from doc_id:
    within a shard, position order must not equal id order."""
    out = registry.QUERIES["corpus_shuffle_shard"](spark, SF_DIR).collect()
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
    scrambled = 0
    for poss in by_shard.values():
        ids_in_pos_order = [d for _, d in sorted(poss)]
        if ids_in_pos_order != sorted(ids_in_pos_order):
            scrambled += 1
    assert scrambled == len(by_shard)


def test_reservoir_sample_bounded_and_deterministic(spark):
    out = registry.QUERIES["sample_reservoir_per_key"](spark, SF_DIR).collect()
    per_key: dict[str, int] = {}
    for r in out:
        per_key[r["source"]] = per_key.get(r["source"], 0) + 1
        assert 1 <= r["rn"] <= 3
    assert per_key and all(n <= 3 for n in per_key.values())


def test_corpus_clean_output_is_deduped_and_above_threshold(spark):
    out = registry.QUERIES["corpus_clean_pipeline"](spark, SF_DIR).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))
    assert all(r["quality"] >= 0.55 for r in out)


def test_gopher_rules_flag_consistent_with_measures(spark):
    for r in registry.QUERIES["text_gopher_rules"](spark, SF_DIR).collect():
        expect = (
            50 <= r["n_words"] <= 100000
            and 3 <= r["mean_word_len"] <= 10
            and r["alpha_word_frac"] > 0.8
            and r["n_stopwords"] >= 2
        )
        # rounded display measures can straddle the raw-threshold
        # boundary only within 1e-4; allow exact-boundary rows to pass
        if abs(r["mean_word_len"] - 3) > 1e-4 and abs(r["mean_word_len"] - 10) > 1e-4 \
           and abs(r["alpha_word_frac"] - 0.8) > 1e-4:
            assert r["passes_gopher"] == expect, dict(r.asDict())
