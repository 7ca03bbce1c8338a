"""Eval-stack tests: summaries, cross-run metrics, AMI, cluster analysis,
count distributions (scipy oracles)."""

import numpy as np
import pytest

from dvae_tpu.eval.cluster_analysis import (K_selection, get_SilhScore,
                                            kfold_classifier)
from dvae_tpu.eval.evaluate import (avg_consensus, avg_max,
                                    compute_consensus_statistics, evals2,
                                    mutinfo)

rng = np.random.default_rng(21)


class TestConsensusMetrics:
    def test_avg_consensus_perfect(self):
        labels = np.tile(rng.integers(0, 5, 50), (3, 1))
        out = avg_consensus(labels)
        assert out == {"all": 1.0, "pairwise": 1.0}

    def test_avg_consensus_partial(self):
        labels = np.zeros((2, 10), dtype=int)
        labels[1, :5] = 1  # arms agree on half the samples
        out = avg_consensus(labels)
        assert out["pairwise"] == pytest.approx(0.5)
        assert out["all"] == pytest.approx(0.5)

    def test_evals2_matrices(self):
        la = rng.integers(0, 6, (3, 200))
        lb = np.concatenate([la[:2], rng.integers(0, 6, (1, 200))])
        out = evals2(la, lb, K=6)
        assert out["within_a"].shape == (3, 3)
        assert out["between"].shape == (3, 3)
        # identical arms across runs → perfect between-consensus diag block
        assert out["between"][0, 0] == pytest.approx(1.0)
        assert out["between"][1, 1] == pytest.approx(1.0)

    def test_consensus_statistics(self):
        runs = [rng.integers(0, 4, (2, 100)) for _ in range(3)]
        stats = compute_consensus_statistics(runs, K=4)
        assert stats["within_run"].shape == (3,)
        assert stats["between_run"].shape == (3, 3)
        assert 0 <= stats["mean_between"] <= 1


class TestMutinfo:
    def test_perfect_correspondence(self):
        n, k = 300, 4
        t = rng.integers(0, k, n)
        targets = np.eye(k, dtype=int)[t]
        probs = np.eye(k)[t] * 0.9 + 0.025  # argmax == t
        mi = mutinfo(probs, targets)
        assert mi.shape == (k, k)
        # every discovered cluster perfectly matches one reference type
        assert avg_max(mi) > 0.9

    def test_random_labels_low_mi(self):
        n, k = 300, 4
        targets = np.eye(k, dtype=int)[rng.integers(0, k, n)]
        probs = rng.random((n, k))
        assert avg_max(mutinfo(probs, targets)) < 0.2

    def test_matches_sklearn_oracle(self):
        """Vectorized contingency-table AMI == the reference's
        sklearn-per-pair double loop (evaluation.py:25-41)."""
        from dvae_tpu.eval.evaluate import mutinfo_oracle
        n, c, f = 800, 7, 5
        t = rng.integers(0, f, n)
        targets = np.eye(f)[t]
        lab = np.where(rng.random(n) < 0.6, t % c, rng.integers(0, c, n))
        probs = np.eye(c)[lab] + 0.01 * rng.random((n, c))
        got, want = mutinfo(probs, targets), mutinfo_oracle(probs, targets)
        np.testing.assert_allclose(got, want, atol=1e-10)

    def test_oracle_match_degenerate(self):
        """Single-cluster predictions and an all-zero target column."""
        from dvae_tpu.eval.evaluate import mutinfo_oracle
        n = 250
        t = rng.integers(1, 4, n)
        targets = np.eye(6)[t]          # column 0 is all-zero
        probs = np.ones((n, 1))         # one discovered cluster
        np.testing.assert_allclose(mutinfo(probs, targets),
                                   mutinfo_oracle(probs, targets),
                                   atol=1e-10)


class TestEvals2Files:
    def test_one_call_from_checkpoints(self, tmp_path):
        """The reference's file-level evals2 workflow (mmidas/_evals.py:8):
        two checkpoint paths + a dataset in, consensus matrices out."""
        from dvae_tpu.data.anndata_io import synthetic_dataset
        from dvae_tpu.eval.evaluate import evals2_files
        from dvae_tpu.train.cpl_mixvae import CplMixVAE

        ds = synthetic_dataset(n_cells=96, n_genes=32, n_types=4, seed=3)
        paths = []
        for seed in (0, 1):
            cpl = CplMixVAE(saving_folder=str(tmp_path / f"r{seed}"),
                            seed=seed)
            cpl.init_model(n_categories=4, input_dim=32, fc_dim=12,
                           lowD_dim=6, n_arm=2, tau=0.1, batch_size=32,
                           epochs_per_jit=2)
            paths.append(cpl.train(ds.log1p, n_epoch=2))
        out = evals2_files(paths[0], paths[1], ds.log1p, batch_size=96)
        assert out["within_a"].shape == (2, 2)
        assert out["between"].shape == (2, 2)
        assert out["l2_between"].shape == (2, 2)
        assert out["labels_a"].shape == (2, 96)
        assert np.all((out["between"] >= 0) & (out["between"] <= 1))


class TestClusterAnalysis:
    def _blobs(self):
        centers = rng.normal(0, 5, (3, 8))
        y = rng.integers(0, 3, 150)
        x = centers[y] + rng.normal(0, 0.5, (150, 8))
        return x, y

    def test_kfold_classifiers(self):
        x, y = self._blobs()
        for kind in ("rf", "lda", "qda"):
            acc, ref, pred = kfold_classifier(x, {"true": y}, kfold=3,
                                              seed=0, kind=kind)
            assert np.mean(acc["true"]) > 0.9, kind

    def test_silhouette(self):
        x, y = self._blobs()
        per_cluster, overall = get_SilhScore(x, y)
        assert len(per_cluster) == 3
        assert overall > 0.5

    def test_k_selection_picks_consensus_jump(self):
        num_pruned = [10, 8, 6, 4]
        recon = [[5.0, 4.0, 3.0, 2.0]] * 2
        con = np.array([[0.5, 0.8, 0.97, 0.99]])
        _, _, ordered_cons, K = K_selection(num_pruned, recon, con, thr=0.9)
        assert K in (6, 8)  # within the >thr region at the max jump
        # threshold unreachable → declines
        *_, K_none = K_selection(num_pruned, recon, con, thr=0.999)
        assert K_none is None


class TestDistributions:
    def test_nb_logprob_matches_scipy(self):
        from scipy import stats

        from dvae_tpu.models.distributions import NegativeBinomial
        import jax.numpy as jnp

        mu, theta = 4.0, 2.5
        k = np.arange(0, 20, dtype=np.float32)
        d = NegativeBinomial(jnp.asarray(mu), jnp.asarray(theta))
        ours = np.asarray(d.log_prob(jnp.asarray(k)))
        ref = stats.nbinom(n=theta, p=theta / (theta + mu)).logpmf(k)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_zinb_logprob_zero_inflation(self):
        from dvae_tpu.models.distributions import (
            NegativeBinomial, ZeroInflatedNegativeBinomial)
        import jax.numpy as jnp

        mu, theta = 4.0, 2.5
        pi_logit = 0.7
        zinb = ZeroInflatedNegativeBinomial(jnp.asarray(mu),
                                            jnp.asarray(theta),
                                            jnp.asarray(pi_logit))
        nb = NegativeBinomial(jnp.asarray(mu), jnp.asarray(theta))
        p = 1 / (1 + np.exp(-pi_logit))
        # P_zinb(0) = p + (1-p)·P_nb(0)
        expected0 = np.log(p + (1 - p) * np.exp(float(nb.log_prob(0.0))))
        assert float(zinb.log_prob(jnp.asarray(0.0))) == pytest.approx(
            expected0, rel=1e-5)
        # P_zinb(k>0) = (1-p)·P_nb(k)
        expected3 = np.log(1 - p) + float(nb.log_prob(3.0))
        assert float(zinb.log_prob(jnp.asarray(3.0))) == pytest.approx(
            expected3, rel=1e-5)

    def test_nb_sampling_moments(self):
        import jax
        from dvae_tpu.models.distributions import NegativeBinomial
        import jax.numpy as jnp

        d = NegativeBinomial(jnp.asarray(5.0), jnp.asarray(3.0))
        s = np.asarray(d.sample(jax.random.key(0), (20000,)))
        assert s.mean() == pytest.approx(5.0, rel=0.05)
        assert s.var() == pytest.approx(float(d.variance), rel=0.1)

    def test_mixture_nb(self):
        from dvae_tpu.models.distributions import NegativeBinomialMixture
        import jax.numpy as jnp

        d = NegativeBinomialMixture(jnp.asarray(2.0), jnp.asarray(10.0),
                                    jnp.asarray(3.0),
                                    jnp.asarray(0.0))  # 50/50 mixture
        lp = float(d.log_prob(jnp.asarray(5.0)))
        assert np.isfinite(lp)
        assert float(d.mean) == pytest.approx(6.0)


class TestTools:
    def test_logcpm_rows_normalized(self):
        from dvae_tpu.utils.tools import logcpm, normalize_cellxgene

        x = rng.gamma(2, 2, (10, 30))
        n = normalize_cellxgene(x)
        np.testing.assert_allclose(n.sum(1), 1.0, rtol=1e-9)
        lc = logcpm(x)
        np.testing.assert_allclose(lc, np.log1p(n * 1e6))

    def test_reorder_genes_puts_variable_first(self):
        x = np.zeros((100, 5))
        x[:, 1] = rng.random(100) > 0.5   # high binarized std
        x[:, 3] = rng.random(100) > 0.9   # lower
        order = __import__("dvae_tpu.utils.tools",
                           fromlist=["reorder_genes"]).reorder_genes(x)
        assert order[0] == 1
        assert 0 not in order  # constant gene dropped

    def test_get_paths_toml(self, tmp_path, monkeypatch):
        from dvae_tpu.utils.tools import get_paths

        (tmp_path / "cfg.toml").write_text(
            '[paths]\nmain_dir="."\n[ds]\nanndata_file="x.h5ad"\n'
            'data_path="data/"\n')
        (tmp_path / "data").mkdir()
        monkeypatch.chdir(tmp_path)
        get_paths.cache_clear()
        cfg = get_paths("cfg.toml", "ds")
        assert cfg["ds"]["anndata_file"] == "x.h5ad"
        assert str(cfg["ds"]["data_path"]) == "data"  # existing → Path

    def test_enable_compile_cache(self, tmp_path, monkeypatch):
        """Persistent-cache wiring: explicit path wins, DVAE_COMPILE_CACHE
        overrides the repo default, and the value ``0`` disables."""
        import jax

        from dvae_tpu.utils.tools import enable_compile_cache

        orig = jax.config.jax_compilation_cache_dir
        try:
            p = str(tmp_path / "cache")
            assert enable_compile_cache(p) == p
            assert jax.config.jax_compilation_cache_dir == p

            monkeypatch.setenv("DVAE_COMPILE_CACHE", "0")
            assert enable_compile_cache() is None
            assert jax.config.jax_compilation_cache_dir == p  # untouched

            env_p = str(tmp_path / "from_env")
            monkeypatch.setenv("DVAE_COMPILE_CACHE", env_p)
            assert enable_compile_cache() == env_p

            # implicit repo default is CPU-gated (the suite pins cpu):
            # cross-host XLA:CPU AOT entries are an ISA-mismatch hazard
            monkeypatch.delenv("DVAE_COMPILE_CACHE")
            assert enable_compile_cache() is None
            assert jax.config.jax_compilation_cache_dir == env_p  # untouched
        finally:
            jax.config.update("jax_compilation_cache_dir", orig)


class TestNBParameterizationConversions:
    def test_roundtrip_and_gamma_moments(self):
        """mu/theta <-> counts/logits conversions invert each other and
        _gamma reproduces the NB mean via its mixing Gamma
        (reference distributions.py:171-221)."""
        import jax
        import jax.numpy as jnp

        from dvae_tpu.models.distributions import (
            NegativeBinomial, _convert_counts_logits_to_mean_disp,
            _convert_mean_disp_to_counts_logits, _gamma)

        mu = jnp.asarray([0.5, 3.0, 40.0])
        theta = jnp.asarray([1.0, 2.0, 8.0])
        tc, logits = _convert_mean_disp_to_counts_logits(mu, theta, eps=0.0)
        mu2, theta2 = _convert_counts_logits_to_mean_disp(tc, logits)
        np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(theta2), np.asarray(theta))

        g = _gamma(theta, mu)
        np.testing.assert_allclose(np.asarray(g.mean), np.asarray(mu),
                                   rtol=1e-6)
        # large-sample gamma-Poisson mean ~ NB mean
        s = g.sample(jax.random.key(0), (4000,))
        np.testing.assert_allclose(s.mean(0), np.asarray(mu), rtol=0.1)
        nb = NegativeBinomial(mu, theta)
        np.testing.assert_allclose(np.asarray(nb.mean), np.asarray(mu))

    def test_mismatched_parameterization_raises(self):
        import jax.numpy as jnp

        from dvae_tpu.models.distributions import \
            _convert_mean_disp_to_counts_logits

        with pytest.raises(ValueError):
            _convert_mean_disp_to_counts_logits(None, jnp.ones(3))

    def test_gamma_log_prob_matches_scipy(self):
        import jax.numpy as jnp

        from dvae_tpu.models.distributions import Gamma
        from scipy import stats

        g = Gamma(jnp.asarray(2.5), jnp.asarray(0.7))
        x = np.asarray([0.3, 1.0, 4.2])
        want = stats.gamma.logpdf(x, a=2.5, scale=1 / 0.7)
        np.testing.assert_allclose(np.asarray(g.log_prob(jnp.asarray(x))),
                                   want, rtol=1e-5)
        # exponential case stays finite at the x == 0 boundary
        g1 = Gamma(jnp.asarray(1.0), jnp.asarray(0.7))
        np.testing.assert_allclose(float(g1.log_prob(jnp.asarray(0.0))),
                                   stats.gamma.logpdf(0.0, a=1.0,
                                                      scale=1 / 0.7),
                                   rtol=1e-5)


def test_log_mixture_nb_shared_dispersion_convention():
    """theta_2=None shares theta_1 (reference distributions.py:100-165)."""
    import jax.numpy as jnp

    from dvae_tpu.models.distributions import log_mixture_nb

    x = jnp.asarray([0.0, 2.0, 7.0])
    mu1, mu2 = jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([4.0, 5.0, 6.0])
    th1 = jnp.asarray([2.0, 2.0, 2.0])
    pi = jnp.asarray([0.3, -0.2, 1.0])
    shared = log_mixture_nb(x, mu1, mu2, th1, None, pi)
    explicit = log_mixture_nb(x, mu1, mu2, th1, th1, pi)
    np.testing.assert_allclose(np.asarray(shared), np.asarray(explicit))


def test_mutinfo_no_int64_overflow_at_large_n():
    """The EMI truncation window must survive N > ~1e5 with balanced
    marginals (int64 a*b*(N-a)*(N-b) wraps there; float64 does not):
    vectorized AMI still matches the sklearn oracle."""
    from dvae_tpu.eval.evaluate import mutinfo, mutinfo_oracle

    N, C, F = 150_000, 3, 2
    r = np.random.default_rng(0)
    t_int = r.integers(0, F, N)
    # clusters correlated with types so the AMI is informative
    p_int = np.where(r.random(N) < 0.8, t_int, r.integers(0, C, N))
    probs = np.eye(C)[p_int]
    targets = np.eye(F)[t_int]
    got = mutinfo(probs, targets)
    want = mutinfo_oracle(probs, targets)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_evals2_between_runs_hungarian_aligned():
    """Two runs with identical clusterings up to a category permutation
    must report between-run consensus ~1 (reference _evals.py:90
    reassign); within-run stays on raw indices."""
    from dvae_tpu.eval.evaluate import evals2

    r = np.random.default_rng(1)
    K, N = 6, 500
    base = r.integers(0, K, N)
    perm = np.array([3, 5, 0, 1, 4, 2])
    labels_a = np.stack([base, base])
    labels_b = np.stack([perm[base], perm[base]])
    out = evals2(labels_a, labels_b, K=K)
    np.testing.assert_allclose(out["within_a"], 1.0)
    np.testing.assert_allclose(out["within_b"], 1.0)
    # ~1 after Hungarian alignment (not exactly 1: confmat_normalize
    # divides by the larger of the two categories' sizes, reference
    # semantics); the unaligned diagonal would be ~0 here
    assert (out["between"] > 0.95).all()
    from dvae_tpu.eval.metrics import (compute_confmat, confmat_mean,
                                       confmat_normalize)
    raw = confmat_mean(confmat_normalize(
        compute_confmat(labels_a[0], labels_b[0], K)))
    assert raw < 0.2  # the bug this guards against: unaligned indices


def test_k_selection_single_qualifier_and_exact_threshold():
    from dvae_tpu.eval.cluster_analysis import K_selection

    # exactly one run above thr: select that run, not the smallest-K one
    num_pruned = [3, 9]
    recon = [[1.0, 0.5]]
    con = np.array([0.5, 0.97])
    *_, K = K_selection(num_pruned, recon, con, thr=0.95)
    assert K == 9
    # thr equal to the max consensus: decline (strict >) instead of
    # guessing
    *_, K = K_selection(num_pruned, recon, con, thr=0.97)
    assert K is None


def test_custom_qda_integer_labels():
    """Integer labels must classify, not silently collapse to class 0
    (the reference never casts labels to str)."""
    from dvae_tpu.analysis.tree_helpers import custom_QDA

    r = np.random.default_rng(2)
    n = 120
    lbl = np.repeat([0, 1], n // 2)
    z = np.concatenate([r.normal(-3, 0.4, (n // 2, 2)),
                        r.normal(3, 0.4, (n // 2, 2))])
    true_lbl, pred = custom_QDA(z, lbl, z, lbl.copy())
    acc = np.mean([p == t for p, t in zip(pred, true_lbl)])
    assert acc > 0.95
    assert set(np.unique(pred.astype(str))) == {"0", "1"}
