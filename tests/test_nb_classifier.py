"""X127 trained hashed-NB classifier — planted-fixture learning gates
(the registered query carries cross-engine parity; the synthetic
corpus's lang⊥text independence makes accuracy there a constant, so
the evidence the model actually LEARNS lives here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gmall_spark.operators import nb


def test_nb_learns_separable_vocab(spark):
    """Disjoint class vocabularies: held-out accuracy must be 1.0,
    including docs mixing a majority of one class's words."""
    train = spark.createDataFrame(
        [(i, "apple banana cherry fig banana", "fruit") for i in range(4)]
        + [(10 + i, "dog cat ferret dog wolf", "animal") for i in range(4)],
        "doc_id long, text string, label string",
    )
    model = nb.train(train)
    test = spark.createDataFrame(
        [(100, "banana banana fig"), (101, "wolf cat cat"),
         (102, "apple dog apple apple")],  # 3-1 majority fruit
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_label for r in nb.predict(test, model).collect()}
    assert got == {100: "fruit", 101: "animal", 102: "fruit"}


def test_nb_uses_multiplicity_not_presence(spark):
    """Multinomial NB scores scale with token COUNTS: both classes
    contain both words, but at opposite rates — a presence/absence
    (Bernoulli-ish) model sees identical feature sets and must guess,
    while the multinomial learner classifies by which word dominates."""
    a = "x x x x y"   # class A: x-heavy
    b = "y y y y x"   # class B: y-heavy
    train = spark.createDataFrame(
        [(i, a, "A") for i in range(3)] + [(10 + i, b, "B") for i in range(3)],
        "doc_id long, text string, label string",
    )
    model = nb.train(train)
    test = spark.createDataFrame(
        [(100, "x x x y y"), (101, "y y y x x")],  # same VOCAB, different counts
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_label for r in nb.predict(test, model).collect()}
    assert got == {100: "A", 101: "B"}


def test_nb_prior_and_tie_break(spark):
    """A doc of only unseen words scores each class at its add-one
    floor: the class PRIOR decides; with equal priors and equal
    totals the exact tie breaks deterministically by label asc."""
    train_unbal = spark.createDataFrame(
        [(i, "p q", "big") for i in range(3)] + [(10, "p q", "small")],
        "doc_id long, text string, label string",
    )
    test = spark.createDataFrame([(100, "zz1 zz2")], "doc_id long, text string")
    got = nb.predict(test, nb.train(train_unbal)).collect()
    assert [r.pred_label for r in got] == ["big"]  # prior 3:1 decides
    train_bal = spark.createDataFrame(
        [(0, "p q", "beta"), (1, "p q", "alpha")],
        "doc_id long, text string, label string",
    )
    got2 = nb.predict(test, nb.train(train_bal)).collect()
    assert [r.pred_label for r in got2] == ["alpha"]  # exact tie -> label asc
