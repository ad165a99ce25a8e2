"""Tests for the formula/design-matrix layer (analogue of R model.matrix;
reference: R/family_data_processing.R:20-36)."""

import numpy as np
import pandas as pd
import pytest

from mcmcglm_tpu.formula import build_design, design_from_arrays


@pytest.fixture
def df():
    rng = np.random.default_rng(0)
    return pd.DataFrame(
        {
            "Y": rng.normal(size=10),
            "X1": rng.normal(size=10),
            "X2": rng.binomial(1, 0.5, 10).astype(float),
            "g": pd.Categorical(["a", "b", "c", "a", "b", "c", "a", "b", "c", "a"]),
        }
    )


class TestBuildDesign:
    def test_named_terms(self, df):
        d = build_design("Y ~ X1 + X2", df)
        assert d.columns == ["(Intercept)", "X1", "X2"]
        np.testing.assert_array_equal(d.X[:, 0], 1.0)
        np.testing.assert_array_equal(d.X[:, 1], df["X1"])
        np.testing.assert_array_equal(d.y, df["Y"])

    def test_dot(self, df):
        d = build_design("Y ~ .", df[["Y", "X1", "X2"]])
        assert d.columns == ["(Intercept)", "X1", "X2"]

    def test_no_intercept(self, df):
        for f in ["Y ~ X1 - 1", "Y ~ 0 + X1"]:
            d = build_design(f, df)
            assert d.columns == ["X1"]

    def test_categorical_expansion(self, df):
        d = build_design("Y ~ g", df)
        # treatment coding drops the first level, like R's default contrasts
        assert d.columns == ["(Intercept)", "gb", "gc"]
        np.testing.assert_array_equal(d.X[:, 1], (df["g"] == "b").astype(float))

    def test_interaction(self, df):
        d = build_design("Y ~ X1:X2", df)
        assert d.columns == ["(Intercept)", "X1:X2"]
        np.testing.assert_allclose(d.X[:, 1], df["X1"] * df["X2"])

    def test_star_expansion(self, df):
        d = build_design("Y ~ X1*X2", df)
        assert d.columns == ["(Intercept)", "X1", "X2", "X1:X2"]

    def test_dict_input(self):
        data = {"Y": np.arange(5.0), "Z": np.ones(5)}
        d = build_design("Y ~ Z", data)
        assert d.columns == ["(Intercept)", "Z"]

    def test_missing_response(self, df):
        with pytest.raises(ValueError, match="response"):
            build_design("W ~ X1", df)

    def test_missing_var(self, df):
        with pytest.raises(ValueError, match="not found"):
            build_design("Y ~ nope", df)

    def test_not_a_formula(self, df):
        with pytest.raises(ValueError, match="formula"):
            build_design("Y + X1", df)


class TestDesignFromArrays:
    def test_basic(self):
        X = np.ones((5, 2))
        y = np.arange(5.0)
        d = design_from_arrays(X, y)
        assert d.columns == ["X1", "X2"]

    def test_add_intercept(self):
        d = design_from_arrays(np.ones((4, 1)), np.zeros(4), add_intercept=True)
        assert d.columns == ["(Intercept)", "X1"]
        assert d.X.shape == (4, 2)

    def test_shape_mismatch(self):
        with pytest.raises(ValueError, match="rows"):
            design_from_arrays(np.ones((4, 2)), np.zeros(5))
