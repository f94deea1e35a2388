"""Model-based quality classifier (r6): feature plumbing + a separable
synthetic corpus the LR must learn."""

from __future__ import annotations


def _corpus():
    good_bodies = [
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away into the woods with a good friend of the family",
        "a long and thoughtful essay about the history of the town and "
        "the people that have lived in it for many years with care",
        "we walked to the market in the morning and bought bread with "
        "the last of the coins that were left over from the trip",
        "science writing should be clear and direct so that the reader "
        "can follow the argument from the premise to the conclusion",
    ]
    bad_bodies = [
        "### ### ### $$$ !!! ### ### $$$ ###",
        "buy buy buy buy buy buy buy buy buy buy buy buy",
        "11111 22222 33333 44444 55555 66666 77777",
        "x",
    ]
    rows = []
    i = 0
    for rep in range(6):  # 24 good + 24 bad rows
        for b in good_bodies:
            rows.append((i, f"{b} v{rep}", 1))
            i += 1
        for b in bad_bodies:
            rows.append((i, f"{b} v{rep}", 0))
            i += 1
    return rows


def test_quality_features_shape(spark):
    from gemini_ocr_batch_spark.operators.quality_model import (
        FEATURE_COLS,
        quality_features,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in quality_features(df).collect()}
    assert set(got) == {1, 2}
    assert set(got[1].asDict()) == {"doc_id", *FEATURE_COLS}
    assert got[1]["n_words"] == 6 and got[1]["stopword_hits"] == 1
    # NULL text yields zeroed features, not NULLs
    assert got[2]["quality_x10000"] is not None


def test_classifier_learns_separable_corpus(spark):
    from gemini_ocr_batch_spark.operators.quality_model import (
        score_quality,
        train_quality_classifier,
    )

    df = spark.createDataFrame(_corpus(), "doc_id long, text string, label int")
    model, metrics = train_quality_classifier(df)
    assert metrics["n_train"] == 48
    assert metrics["train_auc"] > 0.95, metrics

    scored = {r["doc_id"]: r for r in score_quality(df, model).collect()}
    labels = {i: lab for i, _, lab in _corpus()}
    acc = sum(
        1 for i, r in scored.items() if r["pred"] == labels[i]
    ) / len(scored)
    assert acc > 0.9, acc
    assert all(0.0 <= r["prob_good"] <= 1.0 for r in scored.values())
