"""utils/torch_import.py — reference .pth checkpoint importer.

Synthetic torch checkpoints are built with the reference's exact parameter
names (mmidas/nn_model.py:184-255 ModuleLists, udagan.py:217-283 augmenter,
cpl_mixvae.py:777-788 / augmentation/train.py:139-147 dict formats) and
round-tripped through the importer into live dvae_tpu state.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dvae_tpu.config import VAEConfig

A, D, F, L, C, S = 2, 48, 16, 8, 6, 2
CFG = VAEConfig(n_arm=A, input_dim=D, fc_dim=F, lowD_dim=L, n_categories=C,
                state_dim=S, tau=0.1)

rng = np.random.default_rng(0)


def _t(*shape):
    return torch.tensor(rng.normal(size=shape).astype(np.float32))


def _mixvae_state_dict(zinb=False, pruned=False):
    """Reference ``model_state_dict`` with per-arm ModuleList names;
    torch Linear weights are (out, in)."""
    dims = {"fc1": (F, D), "fc2": (F, F), "fc3": (F, F), "fc4": (F, F),
            "fc5": (L, F), "fcc": (C, L),
            "fc_mu": (S, L + C), "fc_sigma": (S, L + C),
            "fc6": (L, C + S), "fc7": (F, L), "fc8": (F, F), "fc9": (F, F),
            "fc10": (F, F), "fc11": (D, F)}
    if zinb:
        dims["fc11_p"] = (D, F)
        dims["fc11_r"] = (D, F)
    sd = {}
    for name, (o, i) in dims.items():
        for a in range(A):
            if pruned and name == "fcc":
                mask = torch.ones(o, i)
                mask[-2:] = 0.0          # prune the last two categories
                sd[f"{name}.{a}.weight_orig"] = _t(o, i)
                sd[f"{name}.{a}.weight_mask"] = mask
            else:
                sd[f"{name}.{a}.weight"] = _t(o, i)
            sd[f"{name}.{a}.bias"] = _t(o)
    for i, d in zip(range(1, 6), (F, F, F, F, L)):
        for a in range(A):
            sd[f"batch_l{i}.{a}.running_mean"] = _t(d)
            sd[f"batch_l{i}.{a}.running_var"] = torch.abs(_t(d)) + 0.5
            sd[f"batch_l{i}.{a}.num_batches_tracked"] = torch.tensor(7)
    return sd


def _adam_sd(sd, lr=2e-3, step=11):
    """Torch Adam ``state_dict`` over the trainable params of ``sd`` in
    registration order (weight, bias per Linear; BN buffers excluded)."""
    keys = [k for k in sd
            if not k.startswith("batch_")
            and ("weight" in k or "bias" in k) and "mask" not in k]
    state = {i: {"step": torch.tensor(float(step)),
                 "exp_avg": 0.01 * torch.ones_like(sd[k]),
                 "exp_avg_sq": 0.02 * torch.ones_like(sd[k])}
             for i, k in enumerate(keys)}
    return {"state": state,
            "param_groups": [{"lr": lr, "params": list(range(len(keys)))}]}


class TestMixVAEImport:
    def test_shapes_transpose_and_bn(self):
        from dvae_tpu.utils.torch_import import mixvae_from_state_dict
        sd = _mixvae_state_dict()
        params, bn, mask, inf = mixvae_from_state_dict(sd)
        assert inf == dict(n_arm=A, input_dim=D, fc_dim=F, lowD_dim=L,
                           n_categories=C, state_dim=S, mode="MSE")
        np.testing.assert_array_equal(
            params["fc1"]["w"][1], np.asarray(sd["fc1.1.weight"]).T)
        np.testing.assert_array_equal(
            bn["bn5"]["var"][0], np.asarray(sd["batch_l5.0.running_var"]))
        assert mask.tolist() == [1.0] * C

    def test_pruned_checkpoint_folds_mask(self):
        from dvae_tpu.utils.torch_import import mixvae_from_state_dict
        params, _, mask, _ = mixvae_from_state_dict(
            _mixvae_state_dict(pruned=True))
        assert mask.tolist() == [1.0] * (C - 2) + [0.0, 0.0]
        assert np.all(params["fcc"]["w"][:, :, -2:] == 0)

    def test_end_to_end_load_and_eval(self, tmp_path):
        from dvae_tpu.train.cpl_mixvae import CplMixVAE
        from dvae_tpu.utils.torch_import import import_mixvae_checkpoint
        sd = _mixvae_state_dict(zinb=True)
        pth = str(tmp_path / "cpl_mixVAE_model_epoch_40.pth")
        torch.save({"model_state_dict": sd,
                    "optimizer_state_dict": _adam_sd(sd)}, pth)
        out = import_mixvae_checkpoint(pth)
        cpl = CplMixVAE(saving_folder=str(tmp_path))
        cpl.init_model(n_categories=C, input_dim=D, fc_dim=F, lowD_dim=L,
                       n_arm=A, state_dim=S, tau=0.1, mode="ZINB", lr=2e-3,
                       batch_size=20, trained_model=out, fused=False)
        # weights actually landed in the live state
        np.testing.assert_allclose(
            np.asarray(cpl.state.params["fc11_r"]["w"][0]),
            np.asarray(sd["fc11_r.0.weight"]).T, rtol=1e-6)
        # Adam moments imported (count + transposed exp_avg)
        adam = cpl.state.opt_state[0]
        assert int(adam.count) == 11
        np.testing.assert_allclose(np.asarray(adam.mu["fc1"]["w"]), 0.01,
                                   rtol=1e-6)
        x = np.maximum(rng.normal(0.5, 1, (40, D)), 0).astype(np.float32)
        res = cpl.eval_model(x, batch_size=20)
        assert np.isfinite(res["total_loss"])
        assert res["pred_label"].shape == (A, 40)

    def test_adam_slots_follow_checkpoint_key_order(self):
        """Moment mapping is positional in torch; the slot list must come
        from the state-dict key order, not an assumed layer order — pairs
        like fc_mu/fc_sigma are same-shaped, so a shape check alone cannot
        catch a swap."""
        from dvae_tpu.utils.torch_import import (_adam_state_from_torch,
                                                 mixvae_from_state_dict)
        sd = _mixvae_state_dict()
        # re-insert with fc_sigma registered BEFORE fc_mu
        reordered = dict(
            sorted(sd.items(),
                   key=lambda kv: kv[0].replace("fc_sigma", "fc_m0")))
        params, _, _, _ = mixvae_from_state_dict(reordered)
        opt_sd = _adam_sd(reordered)
        # tag each param's exp_avg with its slot index so a swap is visible
        for i in opt_sd["state"]:
            opt_sd["state"][i]["exp_avg"] *= (i + 1)
        st = _adam_state_from_torch(opt_sd, params, 1e-3,
                                    list(reordered))
        keys = [k for k in reordered
                if not k.startswith("batch_") and "mask" not in k]
        i_sig = keys.index("fc_sigma.0.weight")
        np.testing.assert_allclose(
            np.asarray(st[0].mu["fc_sigma"]["w"][0]),
            0.01 * (i_sig + 1), rtol=1e-6)

    def test_epoch_parsed_and_wrapper_prefixes(self, tmp_path):
        from dvae_tpu.utils.torch_import import import_mixvae_checkpoint
        from dvae_tpu.utils.checkpoint import load_checkpoint
        sd = {f"module.{k}": v for k, v in _mixvae_state_dict().items()}
        pth = str(tmp_path / "cpl_mixVAE_model_epoch_120.pth")
        torch.save({"model_state_dict": sd}, pth)
        tree, meta = load_checkpoint(import_mixvae_checkpoint(pth))
        assert meta["epoch"] == 120
        assert tree["params"]["fc1"]["w"].shape == (A, D, F)


class TestAugmenterImport:
    def _ckpt(self):
        NZ, Z, H = 4, 3, 10
        D5, H5 = D // 5, H // 5
        dims = {"fc1": (D5, D), "fc2": (D5, D5), "fc3": (H, D5),
                "fc4": (H, H), "fc5": (H5, H + NZ),
                "fc_mu": (Z, H5), "fc_sigma": (Z, H5),
                "fc6": (H5, Z), "fc7": (H, H5), "fc8": (H, H),
                "fc9": (D5, H), "fc10": (D5, D5), "fc11": (D, D5)}
        sd = {"noise.weight": _t(NZ, NZ),
              "bnz.weight": _t(NZ), "bnz.bias": _t(NZ),
              "bnz.running_mean": _t(NZ),
              "bnz.running_var": torch.abs(_t(NZ)) + 0.5,
              "bnz.num_batches_tracked": torch.tensor(3)}
        for name, (o, i) in dims.items():
            sd[f"{name}.weight"] = _t(o, i)
            sd[f"{name}.bias"] = _t(o)
        bn_dims = {"batch_fc1": D5, "batch_fc2": D5, "batch_fc3": H,
                   "batch_fc4": H, "batch_fc5": H5, "batch_fc_mu": Z,
                   "batch_fc6": H5, "batch_fc7": H, "batch_fc8": H,
                   "batch_fc9": D5, "batch_fc10": D5}
        for name, d in bn_dims.items():
            sd[f"{name}.running_mean"] = _t(d)
            sd[f"{name}.running_var"] = torch.abs(_t(d)) + 0.5
        return {"netA": sd, "netD": {}, "optimA": {}, "optimD": {},
                "parameters": {"num_n": NZ, "num_z": Z, "n_features": D,
                               "n_dim": H}}

    def test_import_and_augment(self, tmp_path):
        from dvae_tpu.augment.augmenter import (augment_arms,
                                                load_augmenter)
        from dvae_tpu.utils.torch_import import import_augmenter_checkpoint
        pth = str(tmp_path / "augmenter.pth")
        torch.save(self._ckpt(), pth)
        out = import_augmenter_checkpoint(pth)
        params, bn, cfg = load_augmenter(out)
        assert cfg.input_dim == D and cfg.noise_dim == 4 and cfg.n_dim == 10
        assert params["noise"]["b"] is None   # bias-free (udagan.py:28)
        assert "scale" in bn["bnz"]           # affine=True noise BN
        x = jnp.asarray(rng.random((5, D)).astype(np.float32))
        v = augment_arms(params, bn, cfg, jax.random.key(0), x, n_arm=3)
        assert v.shape == (3, 5, D)
        assert np.isfinite(np.asarray(v)).all()

    def test_pruned_reparam_augmenter_imports(self, tmp_path):
        """Linears left in torch.nn.utils.prune form (weight_orig +
        weight_mask) must fold, not silently drop the layer."""
        from dvae_tpu.utils.torch_import import augmenter_from_checkpoint
        ckpt = self._ckpt()
        sd = ckpt["netA"]
        w = sd.pop("fc1.weight")
        sd["fc1.weight_orig"] = w
        sd["fc1.weight_mask"] = torch.ones_like(w)
        params, _, _ = augmenter_from_checkpoint(ckpt)
        np.testing.assert_array_equal(params["fc1"]["w"],
                                      np.asarray(w).T)

    def test_cli_auto_detect(self, tmp_path, capsys):
        from dvae_tpu.cli import main
        pth = str(tmp_path / "augmenter.pth")
        torch.save(self._ckpt(), pth)
        assert main(["import-torch", pth]) == 0
        assert "augmenter" in capsys.readouterr().out
