"""Generate golden forward-activation fixtures (SURVEY.md §4 golden/parity
tests): fixed-seed params + fixed input -> stored outputs per zoo config.
Run on the CPU backend (like the test suite): python tests/make_goldens.py
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import functools  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

GOLDEN_MODELS = ["XLSTM_HVED", "U_HVEDConvNet3D", "XLSTM_HVED_woViL"]
SHAPE = (1, 16, 16, 16, 4)


def forward(name):
    from xlstm_hved_tpu.models import find_model_using_name
    from xlstm_hved_tpu.utils.subsets import SUBSET_MASKS

    model = find_model_using_name(name)
    x = jnp.asarray(np.random.RandomState(7).rand(*SHAPE), jnp.float32)
    variables = jax.jit(functools.partial(model.init, deterministic=True))(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x)
    out = jax.jit(functools.partial(
        model.apply, recon=True, deterministic=True))(
        variables, x, keep=jnp.asarray(SUBSET_MASKS[10]))
    return np.asarray(out.seg), np.asarray(out.recon)


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in GOLDEN_MODELS:
        seg, recon = forward(name)
        np.savez_compressed(os.path.join(out_dir, f"{name}.npz"),
                            seg=seg, recon=recon)
        print(f"{name}: seg mean {seg.mean():.6f} recon mean {recon.mean():.6f}")


if __name__ == "__main__":
    main()
