"""Generate golden forward-activation fixtures (SURVEY.md §4 golden/parity
tests): fixed-seed params + fixed input -> stored outputs per zoo config.
Run on the CPU backend (like the test suite): python tests/make_goldens.py

Covers (round-1 VERDICT Weak #8): the fp32 path, the bf16 path the
bench/flagship actually runs, and the 15-subset eval-sweep output.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# Match tests/conftest.py exactly: with a different device count XLA:CPU
# compiles different fusions and the bf16 golden drifts ~3e-2.
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")

import functools  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_MODELS = ["XLSTM_HVED", "U_HVEDConvNet3D", "XLSTM_HVED_woViL"]
BF16_MODELS = ["XLSTM_HVED"]
SWEEP_MODELS = ["XLSTM_HVED"]
SHAPE = (1, 16, 16, 16, 4)


def _init(name, **kw):
    from xlstm_hved_tpu.models import find_model_using_name

    model = find_model_using_name(name, **kw)
    x = jnp.asarray(np.random.RandomState(7).rand(*SHAPE), jnp.float32)
    variables = jax.jit(functools.partial(model.init, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x)
    return model, x, variables


def forward(name, compute_dtype="float32"):
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    model, x, variables = _init(name, compute_dtype=compute_dtype)
    out = jax.jit(functools.partial(
        model.apply, recon=True, deterministic=True))(
        variables, x, keep=jnp.asarray(SUBSET_MASKS[10]))
    return np.asarray(out.seg), np.asarray(out.recon)


def sweep_forward(name):
    """15-subset eval sweep output (engine/evaluate.py::make_subset_sweep)
    at patch == volume, fp32."""
    from xlstm_hved_tpu.engine.evaluate import default_apply_fn, make_subset_sweep

    model, x, variables = _init(name)
    sweep = make_subset_sweep(default_apply_fn(model), patch=(16, 16, 16),
                              stride=(16, 16, 16), subset_chunk=5)
    return np.asarray(sweep(variables, x))  # (15, 1, 16, 16, 16, 3)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in GOLDEN_MODELS:
        seg, recon = forward(name)
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"),
                            seg=seg, recon=recon)
        print(f"{name}: seg mean {seg.mean():.6f} recon mean {recon.mean():.6f}")
    for name in BF16_MODELS:
        seg, recon = forward(name, compute_dtype="bfloat16")
        np.savez_compressed(os.path.join(out_dir, f"{name}_bf16.npz"),
                            seg=seg, recon=recon)
        print(f"{name}@bf16: seg mean {seg.mean():.6f} "
              f"recon mean {recon.mean():.6f}")
    for name in SWEEP_MODELS:
        segs = sweep_forward(name)
        np.savez_compressed(os.path.join(out_dir, f"{name}_sweep.npz"),
                            segs=segs)
        print(f"{name}@sweep: per-subset seg means "
              f"{np.round(segs.mean(axis=(1, 2, 3, 4, 5)), 4)}")


if __name__ == "__main__":
    main()
