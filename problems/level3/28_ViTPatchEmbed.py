import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """ViT front end: patchify, linear embed, cls token, encoder layer."""

    def __init__(self, patch, dim):
        self.patch = patch
        self.embed = _mat(patch * patch * 3, dim)
        self.cls = jnp.asarray((np.random.randn(1, 1, dim) * 0.02).astype(np.float32))
        self.h, self.hd = 8, dim // 8
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, c, hh, ww = x.shape
        p = self.patch
        x = x.reshape(b, c, hh // p, p, ww // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (hh // p) * (ww // p), c * p * p)
        x = x @ self.embed
        x = jnp.concatenate([jnp.broadcast_to(self.cls, (b, 1, x.shape[-1])), x], axis=1)
        s = x.shape[1]

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(x @ self.wq), split(x @ self.wk), split(x @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        return x + o.transpose(0, 2, 1, 3).reshape(b, s, -1) @ self.wo


def get_inputs():
    x = np.random.randn(8, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [8, 256]
