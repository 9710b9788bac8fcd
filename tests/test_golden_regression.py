"""Golden-value regression tests.

The reference has no numerical regression net at all (SURVEY.md §4); these
tests pin down scalar fingerprints of the core computations with fixed
seeds, so any unintentional numerical change (layer reorder, mask bug,
dtype drift, init change) fails loudly.  Values were recorded from the
current implementation on CPU fp32 — they are *change detectors*, not
external truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.config import tiny_config
from matcha_tpu.models.matcha import MatchaTTS, init_params

CFG = tiny_config()


def fingerprint_batch():
    rng = np.random.default_rng(1234)
    b, tx, ty = 2, 10, 12
    return (
        jnp.asarray(rng.integers(0, 600, (b, tx)), jnp.int32),
        jnp.asarray([tx, tx - 3], jnp.int32),
        jnp.asarray(rng.standard_normal((b, ty, CFG.n_feats)), jnp.float32),
        jnp.asarray([ty, ty - 4], jnp.int32),
        jnp.asarray(rng.standard_normal((b, 2 * ty, CFG.n_feats)), jnp.float32),
        jnp.asarray([2 * ty, 2 * (ty - 4)], jnp.int32),
        jnp.asarray([0, 1], jnp.int32),
    )


@pytest.fixture(scope="module")
def losses():
    params = init_params(CFG, jax.random.PRNGKey(0))
    return MatchaTTS(CFG).apply(
        {"params": params},
        *fingerprint_batch(),
        jax.random.PRNGKey(7),
        method=MatchaTTS.compute_losses,
        deterministic=True,
    )


class TestGoldenLosses:
    """If these change, a numerical behaviour changed — verify it was
    intentional, then re-record (values from CPU fp32, seeds above)."""

    def test_loss_fingerprints(self, losses):
        got = {
            k: round(float(losses[k]), 4)
            for k in ("diff_loss", "dur_loss", "prior_loss")
        }
        expected_path = "tests/fixtures/golden_losses.json"
        import json
        import os
        from pathlib import Path

        path = Path(__file__).parent / "fixtures" / "golden_losses.json"
        if os.environ.get("RECORD_GOLDEN") == "1":  # deliberate re-baseline
            path.parent.mkdir(exist_ok=True)
            path.write_text(json.dumps(got, indent=2))
            pytest.skip(f"re-recorded golden fixture at {expected_path}")
        # a missing fixture FAILS: silently re-recording would let drift
        # re-baseline itself (record explicitly with RECORD_GOLDEN=1)
        assert path.exists(), (
            f"golden fixture {expected_path} missing — run once with "
            f"RECORD_GOLDEN=1 to record it deliberately"
        )
        expected = json.loads(path.read_text())
        for k, v in expected.items():
            assert abs(got[k] - v) < 2e-3, (
                f"{k} drifted: {got[k]} vs golden {v} — if intentional, "
                f"re-record with RECORD_GOLDEN=1"
            )
