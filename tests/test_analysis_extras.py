"""Tree helpers / correlation analysis / parser / runtime utility tests."""

import numpy as np
import pytest

from dvae_tpu.analysis.tree_based import (corr_analysis, corr_analysis_naive,
                                          masked_pearson)
from dvae_tpu.analysis.tree_helpers import custom_QDA, predict_leaf_gmm
from dvae_tpu.utils.parser import (any_digit, choice, compose, many,
                                   one_char, sat)

rng = np.random.default_rng(31)


class TestCvFold:
    """Synthetic .mat CV-fold roundtrip (reference
    analysis_tree_helpers.py:197-372)."""

    def _fixture(self, tmp_path):
        import scipy.io as sio

        n_ref, n_tr, n_val, z = 40, 20, 8, 3
        refdata = {
            "cluster_color": np.array(
                ["#808080" if i % 4 == 0 else f"#c{i:05d}"
                 for i in range(n_ref)], dtype=object),
            "cluster": np.array([f"t{i % 5}" for i in range(n_ref)],
                                dtype=object),
            "clusterID": np.arange(n_ref),
            "T_ispaired": (np.arange(n_ref) % 2 == 0).astype(int),
            "E_ispaired": (np.arange(n_ref) % 2 == 0).astype(int),
            "T_dat": rng.normal(0, 1, (n_ref, 6)),
            "E_dat": rng.normal(0, 1, (n_ref, 4)),
        }
        mat = {
            "z_train_0": rng.normal(0, 1, (n_tr, z)),
            "z_train_1": rng.normal(0, 1, (n_tr, z)),
            "z_val_0": rng.normal(0, 1, (n_val, z)),
            "z_val_1": rng.normal(0, 1, (n_val, z)),
            "train_ind_T": np.arange(n_tr),
            "train_ind_E": np.arange(n_tr),
            "val_ind": np.arange(n_tr, n_tr + n_val),
        }
        p = str(tmp_path / "cv.mat")
        sio.savemat(p, mat)
        return p, refdata, mat

    def test_extended_carries_indices(self, tmp_path):
        from dvae_tpu.analysis.tree_helpers import get_cvfold_extended

        p, refdata, mat = self._fixture(tmp_path)
        tr_p, val_p, tr_l, val_l = get_cvfold_extended(p, refdata)
        paired = refdata["T_ispaired"][mat["train_ind_T"]] == 1
        np.testing.assert_array_equal(tr_p["T_ind"],
                                      mat["train_ind_T"][paired])
        np.testing.assert_array_equal(val_p["T_ind"], mat["val_ind"])
        # leaf split removes the gray (merged) nodes, indices follow
        assert (tr_l["color"] != "#808080").all()
        assert len(tr_l["T_ind"]) == len(tr_l["T_z"])

    def test_extended_full_data_gathers_features(self, tmp_path):
        from dvae_tpu.analysis.tree_helpers import get_cvfold_extended

        p, refdata, _ = self._fixture(tmp_path)
        _, _, tr_l, val_l = get_cvfold_extended(p, refdata, full_data=True)
        for leaf in (tr_l, val_l):
            np.testing.assert_array_equal(
                leaf["T_x"], refdata["T_dat"][leaf["T_ind"], :])
            np.testing.assert_array_equal(
                leaf["E_x"], refdata["E_dat"][leaf["E_ind"], :])

    def test_matches_get_cvfold(self, tmp_path):
        """Extended is a superset of get_cvfold's fields/values."""
        from dvae_tpu.analysis.tree_helpers import (get_cvfold,
                                                    get_cvfold_extended)

        p, refdata, _ = self._fixture(tmp_path)
        base = get_cvfold(p, refdata)
        ext = get_cvfold_extended(p, refdata)
        for b, e in zip(base, ext):
            for k in b:
                np.testing.assert_array_equal(b[k], e[k])


class TestCorrAnalysis:
    def test_vectorized_matches_scipy_loop(self):
        state = rng.normal(0, 1, (80, 2))
        cell = np.maximum(rng.normal(0.5, 1, (80, 15)), 0)
        cell[:, 3] = 0.0  # all-zero gene
        fast_c, fast_id = corr_analysis(state, cell)
        slow_c, slow_id = corr_analysis_naive(state, cell)
        for f, s in zip(fast_c, slow_c):
            np.testing.assert_allclose(f, s, atol=1e-10)

    def test_planted_correlation_found(self):
        state = rng.normal(0, 1, (200, 1))
        cell = np.abs(rng.normal(1, 0.1, (200, 10)))
        cell[:, 7] = np.abs(2.0 * state[:, 0] + 5)  # strongly correlated
        _, gene_ids = corr_analysis(state, cell)
        assert gene_ids[0][-1] == 7  # highest |r| gene last in ascending sort

    def test_min_nonzero_rule(self):
        state = rng.normal(0, 1, (50, 1))
        cell = np.zeros((50, 2))
        cell[:3, 0] = 1.0  # only 3 nonzero cells → r forced to 0
        cell[:, 1] = np.abs(state[:, 0]) + 1
        r = masked_pearson(state[:, 0], cell)
        assert r[0] == 0.0 and abs(r[1]) > 0


class TestLeafClassifiers:
    def _blobs(self, n=200):
        centers = {"A": [0, 0], "B": [6, 0], "C": [0, 6]}
        labels = rng.choice(list(centers), n)
        z = np.array([centers[l] for l in labels]) + rng.normal(0, .5, (n, 2))
        return z, labels.astype(object)

    def test_custom_qda_recovers_blobs(self):
        z_tr, y_tr = self._blobs(300)
        z_te, y_te = self._blobs(100)
        true, pred = custom_QDA(z_tr, y_tr, z_te, y_te)
        assert np.mean(true == pred) > 0.95

    def test_predict_leaf_gmm_with_merge(self):
        z_tr, y_tr = self._blobs(300)
        z_te, y_te = self._blobs(100)
        # merge B and C into the parent "BC"
        desc = {"BC": ["B", "C"], "A": []}
        true, pred, n_exc, n_pred, n_rm, prob = predict_leaf_gmm(
            z_tr, y_tr, z_te, list(y_te),
            unique_dataset_lbl=["A", "BC"], unique_leaf_lbl=["A", "B", "C"],
            descendant_dict=desc)
        assert set(np.unique(pred)) <= {"A", "BC"}
        assert np.mean(true == pred) > 0.95
        assert prob.shape == true.shape


class TestParser:
    def test_primitives(self):
        assert one_char("a")("abc") == ("a", "bc")
        assert one_char("a")("xbc") is None
        assert any_digit()("1x") == ("1", "x")

    def test_compose_choice_many(self):
        p = compose(one_char("a"), any_digit())
        assert p("a1rest") == (("a", "1"), "rest")
        assert p("ax") is None
        c = choice(one_char("a"), one_char("b"))
        assert c("b!") == ("b", "!")
        m = many(any_digit())
        assert m("123x") == (["1", "2", "3"], "x")


def test_kl_dist_zero_for_identical():
    import jax.numpy as jnp
    from dvae_tpu.augment.augmenter import kl_dist
    mu = jnp.asarray(rng.normal(0, 1, (10, 4)).astype(np.float32))
    var = jnp.asarray(rng.random((10, 4)).astype(np.float32) + 0.5)
    assert float(kl_dist(mu, var, mu, var)) == pytest.approx(0.0, abs=1e-5)
    # KL > 0 for different distributions
    assert float(kl_dist(mu, var, mu + 1.0, var)) > 0
