"""Distributed logistic regression (operators/classifier.py): gradient
parity vs a numpy oracle running the SAME algorithm, separation
behavior, null imputation, and codegen-only apply."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from hrdp_variant_load_pipeline_spark.operators.classifier import (
    apply_logreg,
    train_logreg,
)


def _labeled(spark, seed=3, n=200):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        y = i % 2
        x1 = rng.normal(2.0 if y else -2.0, 1.0)
        x2 = rng.normal(0.0, 1.0)  # uninformative
        rows.append((float(x1), float(x2), y))
    return rows, spark.createDataFrame(rows, "x1 double, x2 double, label int")


def _numpy_train(rows, n_iter, lr):
    X = np.array([[r[0], r[1]] for r in rows])
    y = np.array([r[2] for r in rows], dtype=float)
    mu, sd = X.mean(0), X.std(0)
    Z = (X - mu) / sd
    w = np.zeros(2)
    b = 0.0
    n = len(rows)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(Z @ w + b)))
        err = p - y
        w -= lr * (Z.T @ err) / n
        b -= lr * err.sum() / n
    return w, b, mu, sd


def test_matches_numpy_same_algorithm(spark):
    rows, df = _labeled(spark)
    model = train_logreg(df, ["x1", "x2"], "label", n_iter=40, lr=0.5)
    w_np, b_np, mu, sd = _numpy_train(rows, 40, 0.5)
    assert abs(model["weights"]["x1"] - w_np[0]) < 1e-9
    assert abs(model["weights"]["x2"] - w_np[1]) < 1e-9
    assert abs(model["bias"] - b_np) < 1e-9
    assert abs(model["standardize"]["x1"][0] - mu[0]) < 1e-9


def test_separates_and_ignores_noise_feature(spark):
    rows, df = _labeled(spark)
    model = train_logreg(df, ["x1", "x2"], "label", n_iter=60, lr=0.5)
    assert model["weights"]["x1"] > 1.0  # informative
    assert abs(model["weights"]["x2"]) < 0.5  # noise
    scored = df.select("label", apply_logreg(model).alias("p"))
    acc = scored.select(
        F.avg(((F.col("p") > 0.5).cast("int") == F.col("label")).cast("int"))
    ).collect()[0][0]
    assert acc > 0.9


def test_null_features_impute_to_mean_and_apply_is_codegen(spark):
    rows, df = _labeled(spark)
    model = train_logreg(df, ["x1", "x2"], "label", n_iter=20, lr=0.5)
    holey = df.withColumn(
        "x2", F.when(F.col("label") == 1, None).otherwise(F.col("x2"))
    )
    out = holey.select(apply_logreg(model).alias("p"))
    assert out.filter(F.col("p").isNull()).count() == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    _ = math
