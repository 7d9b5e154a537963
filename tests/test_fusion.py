"""Fusion MLP + InfoNCE: loss math vs a brute-force reference, training
decreases loss, mean-image fallback semantics."""
import numpy as np

import jax
import jax.numpy as jnp

from plotpointe_tpu.config import FusionConfig
from plotpointe_tpu.models.fusion import (
    FusionModel,
    fuse_all_items,
    infonce_fusion_loss,
    train_fusion,
)


def _brute_infonce(fused, txt, img, T=0.07):
    def norm(x):
        return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    f, t, i = norm(fused), norm(txt), norm(img)
    n = len(f)

    def xent(sim):
        # softmax cross-entropy with diagonal labels
        m = sim.max(axis=1, keepdims=True)
        logz = m[:, 0] + np.log(np.exp(sim - m).sum(axis=1))
        return float(np.mean(logz - sim[np.arange(n), np.arange(n)]))

    lt = xent(f @ t.T / T)
    li = xent(f @ i.T / T)
    return (lt + li) / 2


def test_infonce_matches_brute_force(rng):
    # all three inputs live in the fused space (the reference projects the
    # modalities before the loss, fuse_modal.py:192-197)
    n, d = 32, 16
    fused = rng.normal(size=(n, d)).astype(np.float32)
    txt = rng.normal(size=(n, d)).astype(np.float32)
    img = rng.normal(size=(n, d)).astype(np.float32)
    loss, lt, li = infonce_fusion_loss(jnp.asarray(fused), jnp.asarray(txt), jnp.asarray(img))
    want = _brute_infonce(fused, txt, img)
    np.testing.assert_allclose(float(loss), want, rtol=1e-4)
    np.testing.assert_allclose((float(lt) + float(li)) / 2, want, rtol=1e-4)


def test_fusion_training_decreases_loss(rng):
    n = 256
    cfg = FusionConfig(text_dim=24, img_dim=16, output_dim=8, hidden_dim=32, epochs=4, batch_size=64)
    txt = rng.normal(size=(n, 24)).astype(np.float32)
    img = rng.normal(size=(n, 16)).astype(np.float32)
    img_row = np.arange(n)  # all items have images
    params, hist = train_fusion(txt, img, img_row, cfg)
    losses = [hist[f"epoch_{e}_loss"] for e in range(1, 5)]
    assert losses[-1] < losses[0]


def test_fuse_all_items_mean_fallback(rng):
    n = 50
    cfg = FusionConfig(text_dim=8, img_dim=6, output_dim=4, hidden_dim=16)
    model = FusionModel(cfg)
    params = model.init(jax.random.key(0))
    txt = rng.normal(size=(n, 8)).astype(np.float32)
    img = rng.normal(size=(10, 6)).astype(np.float32)
    img_row = np.full(n, -1, dtype=np.int64)
    img_row[:10] = np.arange(10)

    fused = fuse_all_items(params, txt, img, img_row, cfg, batch_size=16)
    assert fused.shape == (n, 4)
    # output is L2-normalized
    np.testing.assert_allclose(np.linalg.norm(fused, axis=1), 1.0, atol=1e-4)
    # items without images all use the mean image: same txt -> same output
    txt2 = txt.copy()
    txt2[20] = txt[30]
    fused2 = fuse_all_items(params, txt2, img, img_row, cfg, batch_size=16)
    np.testing.assert_allclose(fused2[20], fused2[30], atol=1e-5)
