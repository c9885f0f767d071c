"""Generate the shipped TPU-native KernelBench-style problem sets.

Run from the repo root:  python tools/gen_problems.py

Each problem file defines Model / get_inputs / get_init_inputs in plain JAX
(numpy RNG for inputs so the eval harness's set_seed controls trials).
Level 1: single operators.  Level 2: fused operator patterns.
Level 3: small full architectures.
"""

import os
import textwrap

ROOT = os.path.join(os.path.dirname(__file__), "..", "problems")

HEADER = """\
import numpy as np
import jax
import jax.numpy as jnp

"""


def write(level: int, pid: int, name: str, body: str) -> None:
    d = os.path.join(ROOT, f"level{level}")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{pid}_{name}.py")
    with open(path, "w") as f:
        f.write(HEADER + textwrap.dedent(body).lstrip("\n"))
    print("wrote", path)


# ----------------------------------------------------------------------
# Level 1 — single operators
# ----------------------------------------------------------------------

write(1, 1, "MatMul", """
class Model:
    \"\"\"Plain matrix multiplication: C = A @ B.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.matmul(a, b)


M, K, N = 1024, 2048, 1024


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 2, "BatchedMatMul", """
class Model:
    \"\"\"Batched matrix multiplication over a leading batch dimension.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.einsum("bij,bjk->bik", a, b)


B, M, K, N = 16, 256, 512, 256


def get_inputs():
    a = np.random.randn(B, M, K).astype(np.float32)
    b = np.random.randn(B, K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 3, "MatVec", """
class Model:
    \"\"\"Matrix-vector product.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, x):
        return a @ x


M, K = 4096, 4096


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    x = np.random.randn(K).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 6, "Conv2d", """
class Model:
    \"\"\"2D convolution (NCHW, OIHW weights, VALID padding).\"\"\"

    def __init__(self, in_ch, out_ch, ksize):
        scale = 1.0 / np.sqrt(in_ch * ksize * ksize)
        self.w = jnp.asarray(
            (np.random.randn(out_ch, in_ch, ksize, ksize) * scale).astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )


def get_inputs():
    x = np.random.randn(8, 16, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [16, 32, 3]
""")

write(1, 11, "Transpose", """
class Model:
    \"\"\"2D transpose.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return x.T


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 18, "ReLU", """
class Model:
    \"\"\"Rectified linear unit.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.maximum(x, 0.0)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 19, "GELU", """
class Model:
    \"\"\"Gaussian error linear unit (tanh approximation).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.gelu(x, approximate=True)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 21, "Sigmoid", """
class Model:
    \"\"\"Logistic sigmoid.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.sigmoid(x)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 23, "Softmax", """
class Model:
    \"\"\"Row-wise softmax.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.softmax(x, axis=-1)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 24, "LogSumExp", """
class Model:
    \"\"\"Row-wise log-sum-exp reduction.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.scipy.special.logsumexp(x, axis=-1)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 26, "SiLU", """
class Model:
    \"\"\"SiLU / swish activation.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return x * jax.nn.sigmoid(x)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 33, "LayerNorm", """
class Model:
    \"\"\"Layer normalization over the last dimension, learned scale/shift.\"\"\"

    def __init__(self, dim):
        self.gamma = jnp.asarray(np.random.randn(dim).astype(np.float32))
        self.beta = jnp.asarray(np.random.randn(dim).astype(np.float32))

    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * self.gamma + self.beta


DIM = 4096


def get_inputs():
    x = np.random.randn(2048, DIM).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [DIM]
""")

write(1, 36, "RMSNorm", """
class Model:
    \"\"\"Root-mean-square normalization with learned scale.\"\"\"

    def __init__(self, dim):
        self.weight = jnp.asarray(np.random.randn(dim).astype(np.float32))

    def __call__(self, x):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + 1e-6) * self.weight


DIM = 4096


def get_inputs():
    x = np.random.randn(2048, DIM).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [DIM]
""")

write(1, 40, "SumReduce", """
class Model:
    \"\"\"Sum reduction over the last dimension.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.sum(x, axis=-1)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 45, "CumSum", """
class Model:
    \"\"\"Cumulative sum along the last dimension.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.cumsum(x, axis=-1)


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 51, "MaxPool2d", """
class Model:
    \"\"\"2x2 max pooling, stride 2 (NCHW).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, 2, 2),
            window_strides=(1, 1, 2, 2),
            padding="VALID",
        )


def get_inputs():
    x = np.random.randn(16, 32, 128, 128).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

# ----------------------------------------------------------------------
# Level 2 — fused operator patterns
# ----------------------------------------------------------------------

write(2, 1, "MatMulReLU", """
class Model:
    \"\"\"Linear layer followed by ReLU.\"\"\"

    def __init__(self, in_f, out_f):
        scale = 1.0 / np.sqrt(in_f)
        self.w = jnp.asarray((np.random.randn(in_f, out_f) * scale).astype(np.float32))
        self.b = jnp.asarray(np.zeros(out_f, dtype=np.float32))

    def __call__(self, x):
        return jnp.maximum(x @ self.w + self.b, 0.0)


def get_inputs():
    x = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [2048, 2048]
""")

write(2, 5, "MatMulGELUResidual", """
class Model:
    \"\"\"Linear + GELU + residual connection.\"\"\"

    def __init__(self, dim):
        scale = 1.0 / np.sqrt(dim)
        self.w = jnp.asarray((np.random.randn(dim, dim) * scale).astype(np.float32))

    def __call__(self, x):
        return x + jax.nn.gelu(x @ self.w, approximate=True)


def get_inputs():
    x = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [2048]
""")

write(2, 9, "SwiGLU", """
class Model:
    \"\"\"SwiGLU feed-forward: (silu(x Wg) * (x Wu)) Wd.\"\"\"

    def __init__(self, dim, hidden):
        s1 = 1.0 / np.sqrt(dim)
        s2 = 1.0 / np.sqrt(hidden)
        self.wg = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wu = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wd = jnp.asarray((np.random.randn(hidden, dim) * s2).astype(np.float32))

    def __call__(self, x):
        g = x @ self.wg
        u = x @ self.wu
        return (g * jax.nn.sigmoid(g) * u) @ self.wd


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [1024, 2816]
""")

write(2, 13, "RMSNormMatMul", """
class Model:
    \"\"\"RMSNorm followed by a linear projection.\"\"\"

    def __init__(self, dim, out):
        self.g = jnp.asarray(np.random.randn(dim).astype(np.float32))
        scale = 1.0 / np.sqrt(dim)
        self.w = jnp.asarray((np.random.randn(dim, out) * scale).astype(np.float32))

    def __call__(self, x):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + 1e-6) * self.g) @ self.w


def get_inputs():
    x = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [2048, 2048]
""")

write(2, 17, "ScaledDotProductAttention", """
class Model:
    \"\"\"Single-head scaled dot-product attention.\"\"\"

    def __init__(self):
        pass

    def __call__(self, q, k, v):
        d = q.shape[-1]
        scores = (q @ k.T) / jnp.sqrt(jnp.float32(d))
        return jax.nn.softmax(scores, axis=-1) @ v


S, D = 1024, 128


def get_inputs():
    q = np.random.randn(S, D).astype(np.float32)
    k = np.random.randn(S, D).astype(np.float32)
    v = np.random.randn(S, D).astype(np.float32)
    return [jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)]


def get_init_inputs():
    return []
""")

write(2, 21, "SoftmaxMatMul", """
class Model:
    \"\"\"Row-wise softmax followed by a matmul.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jax.nn.softmax(a, axis=-1) @ b


def get_inputs():
    a = np.random.randn(1024, 1024).astype(np.float32)
    b = np.random.randn(1024, 512).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

# ----------------------------------------------------------------------
# Level 3 — small full architectures
# ----------------------------------------------------------------------

write(3, 1, "MLP", """
class Model:
    \"\"\"Three-layer MLP with ReLU activations.\"\"\"

    def __init__(self, dims):
        self.ws = []
        self.bs = []
        for din, dout in zip(dims[:-1], dims[1:]):
            scale = 1.0 / np.sqrt(din)
            self.ws.append(
                jnp.asarray((np.random.randn(din, dout) * scale).astype(np.float32))
            )
            self.bs.append(jnp.asarray(np.zeros(dout, dtype=np.float32)))

    def __call__(self, x):
        for i, (w, b) in enumerate(zip(self.ws, self.bs)):
            x = x @ w + b
            if i < len(self.ws) - 1:
                x = jnp.maximum(x, 0.0)
        return x


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[1024, 2048, 2048, 1024]]
""")

write(3, 5, "TransformerBlock", """
class Model:
    \"\"\"Pre-norm transformer block: RMSNorm -> MHA -> RMSNorm -> SwiGLU.\"\"\"

    def __init__(self, dim, n_heads, hidden):
        def mat(m, n):
            return jnp.asarray(
                (np.random.randn(m, n) / np.sqrt(m)).astype(np.float32)
            )

        self.dim, self.n_heads = dim, n_heads
        self.hd = dim // n_heads
        self.ln1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.ln2 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.wq, self.wk, self.wv, self.wo = (
            mat(dim, dim), mat(dim, dim), mat(dim, dim), mat(dim, dim)
        )
        self.wg, self.wu, self.wd = mat(dim, hidden), mat(dim, hidden), mat(hidden, dim)

    def _rms(self, x, g):
        return x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6
        ) * g

    def __call__(self, x):
        s, d = x.shape
        h = self._rms(x, self.ln1)
        q = (h @ self.wq).reshape(s, self.n_heads, self.hd).transpose(1, 0, 2)
        k = (h @ self.wk).reshape(s, self.n_heads, self.hd).transpose(1, 0, 2)
        v = (h @ self.wv).reshape(s, self.n_heads, self.hd).transpose(1, 0, 2)
        scores = q @ k.transpose(0, 2, 1) / jnp.sqrt(jnp.float32(self.hd))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask[None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1) @ v
        attn = attn.transpose(1, 0, 2).reshape(s, d)
        x = x + attn @ self.wo
        h = self._rms(x, self.ln2)
        g = h @ self.wg
        return x + ((g * jax.nn.sigmoid(g)) * (h @ self.wu)) @ self.wd


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [512, 8, 1408]
""")

write(3, 9, "ConvNet", """
class Model:
    \"\"\"Small conv net: two conv+relu+pool stages and a linear head.\"\"\"

    def __init__(self):
        def conv_w(o, i, k):
            scale = 1.0 / np.sqrt(i * k * k)
            return jnp.asarray((np.random.randn(o, i, k, k) * scale).astype(np.float32))

        self.w1 = conv_w(16, 3, 3)
        self.w2 = conv_w(32, 16, 3)
        self.head = jnp.asarray(
            (np.random.randn(32 * 6 * 6, 10) * 0.03).astype(np.float32)
        )

    def _stage(self, x, w):
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        x = jnp.maximum(x, 0.0)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )

    def __call__(self, x):
        x = self._stage(x, self.w1)
        x = self._stage(x, self.w2)
        return x.reshape(x.shape[0], -1) @ self.head


def get_inputs():
    x = np.random.randn(32, 3, 30, 30).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

print("done")
