"""TYPECHECK contract: runtime jaxtyping shape validation behind the env var.

The reference CI runs its whole suite with TYPECHECK=True so every call is
shape-checked (reference transfusion.py:187, .github/workflows/test.yml:4-6).
Here the decorator binds at import time, so the checks are exercised in a
subprocess with TYPECHECK=1 set before the import.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from transfusion_tpu.ops.spans import spans_to_attn_mask, spans_to_token_times
from transfusion_tpu.ops.flow import min_p_filter
from transfusion_tpu.models.transfusion import Transfusion

# 1) good shapes pass (and a full loss runs under typechecking)
spans = jnp.array([[[0, 2, 3]]], jnp.int32)
mask = spans_to_attn_mask(8, spans)
assert mask.shape == (1, 8, 8)
_ = spans_to_token_times(8, spans, jnp.zeros((1, 1)))
_ = min_p_filter(jnp.zeros((2, 7)))

model = Transfusion(
    num_text_tokens=16, dim_latent=4, modality_default_shape=(2,),
    transformer=dict(dim=16, depth=1, dim_head=8, heads=2), pad_multiple=16,
)
params = model.init_params(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
batch = [[rng.integers(0, 16, 4).astype(np.int32),
          rng.standard_normal((2, 4)).astype(np.float32)]]
packed = jax.tree.map(jnp.asarray, model.pack(batch))
total, _ = model._loss_impl(
    params, packed, jax.random.PRNGKey(1), None, None,
    prob_uncond=0.0, velocity_delta=1e-3, train=False,
)
assert float(total) > 0

# 2) bad shapes raise
failures = 0
try:
    spans_to_attn_mask(8, jnp.zeros((1, 1, 4), jnp.int32))  # last dim 4 != 3
except Exception:
    failures += 1
try:
    spans_to_token_times(8, spans, jnp.zeros((2, 1)))  # b mismatch
except Exception:
    failures += 1
try:
    min_p_filter(jnp.zeros((3,), jnp.int32))  # int, not float
except Exception:
    failures += 1
assert failures == 3, f"expected 3 shape errors, got {failures}"
print("TYPECHECK-OK")
"""


def _run(env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-c", _CHILD], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )


def test_typecheck_enabled_validates_shapes():
    proc = _run({"TYPECHECK": "1"})
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TYPECHECK-OK" in proc.stdout


@pytest.mark.slow  # >30s on the 1-core CI host (VERDICT r4 #3 tiering)
def test_typecheck_disabled_is_identity():
    # without TYPECHECK the bad-shape calls must NOT raise at the decorator
    # (they may still fail deeper or silently broadcast — the child asserts
    # exactly 3 failures, so it exits nonzero when checks are off)
    proc = _run({"TYPECHECK": ""})
    assert proc.returncode != 0
    assert "expected 3 shape errors" in (proc.stderr + proc.stdout)
