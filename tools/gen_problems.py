"""Generate the shipped TPU-native KernelBench-style problem sets.

Run from the repo root:  python tools/gen_problems.py

Reference-scale corpus (round-5 VERDICT item 3): level1=100 single
operators, level2=100 fused operator patterns, level3=50 small full
architectures — matching the reference experiment scale
(/root/reference/main.py:36-51: level1=100, level2=100, level3=50).

Each problem file defines Model / get_inputs / get_init_inputs in plain JAX
(numpy RNG for inputs so the eval harness's set_seed controls trials).
Shapes are sized for fast CPU-sandbox eval (the evalkit runs reference and
candidate on host CPU with per-op timeouts): every problem's reference
forward stays well under a second on a 2-core VM.

Level 1 is a curated operator table; level 2 composes a backbone op with
post-op chains from a component library (names read as the op chain, like
the reference set's); level 3 is a set of architecture templates.

Verification: tools/verify_problems.py execs every generated file, runs the
reference Model on its inputs, and checks the canned mock solution
(harness.generate.MockGenerator's ModelNew-subclass) compiles and passes
value parity through evalkit.jax_eval.
"""

import os
import textwrap

ROOT = os.path.join(os.path.dirname(__file__), "..", "problems")

HEADER = """\
import numpy as np
import jax
import jax.numpy as jnp

"""

_written = {1: [], 2: [], 3: []}

# regeneration replaces the whole set: stale files at reused ids (earlier
# rounds' smaller corpus used different names) would otherwise trip the
# ProblemDataset duplicate-id check
for _lvl in (1, 2, 3):
    _d = os.path.join(ROOT, f"level{_lvl}")
    if os.path.isdir(_d):
        for _f in os.listdir(_d):
            if _f.endswith(".py"):
                os.remove(os.path.join(_d, _f))


def write(level: int, pid: int, name: str, body: str) -> None:
    d = os.path.join(ROOT, f"level{level}")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{pid}_{name}.py")
    assert pid not in [p for p, _ in _written[level]], (level, pid, name)
    _written[level].append((pid, name))
    with open(path, "w") as f:
        f.write(HEADER + textwrap.dedent(body).lstrip("\n"))


# ======================================================================
# Level 1 — 100 single operators
# ======================================================================

# ---- matmul family ---------------------------------------------------

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

write(1, 4, "MatMulTransposedA", """
class Model:
    \"\"\"Matrix multiplication with a transposed first operand: A.T @ B.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a.T @ b


K, M, N = 2048, 1024, 1024


def get_inputs():
    a = np.random.randn(K, M).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 5, "MatMulTransposedB", """
class Model:
    \"\"\"Matrix multiplication with a transposed second operand: A @ B.T.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a @ b.T


M, K, N = 1024, 2048, 1024


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(N, K).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


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

write(1, 7, "MatMulIrregular", """
class Model:
    \"\"\"Matrix multiplication at odd, non-power-of-two shapes.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a @ b


M, K, N = 1000, 1791, 1227


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 8, "MatMulSmallK", """
class Model:
    \"\"\"Tall outer-product-like matmul: large M/N, tiny K.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a @ b


M, K, N = 4096, 16, 2048


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 9, "TensorMatMul3d", """
class Model:
    \"\"\"3D tensor times matrix over the last axis: [B, S, K] @ [K, N].\"\"\"

    def __init__(self):
        pass

    def __call__(self, x, w):
        return jnp.einsum("bsk,kn->bsn", x, w)


def get_inputs():
    x = np.random.randn(8, 512, 512).astype(np.float32)
    w = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(w)]


def get_init_inputs():
    return []
""")

write(1, 10, "TensorMatMul4d", """
class Model:
    \"\"\"4D tensor times matrix over the last axis: [A, B, S, K] @ [K, N].\"\"\"

    def __init__(self):
        pass

    def __call__(self, x, w):
        return jnp.einsum("absk,kn->absn", x, w)


def get_inputs():
    x = np.random.randn(4, 8, 128, 256).astype(np.float32)
    w = np.random.randn(256, 512).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(w)]


def get_init_inputs():
    return []
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

write(1, 12, "Permute3d", """
class Model:
    \"\"\"3D axis permutation [B, S, D] -> [D, B, S].\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.transpose(x, (2, 0, 1))


def get_inputs():
    x = np.random.randn(64, 512, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 13, "MatMulBothTransposed", """
class Model:
    \"\"\"Matrix multiplication with both operands transposed: A.T @ B.T.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a.T @ b.T


M, K, N = 1024, 1024, 1024


def get_inputs():
    a = np.random.randn(K, M).astype(np.float32)
    b = np.random.randn(N, K).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 14, "SymmetricMatMul", """
class Model:
    \"\"\"C = A @ A.T — a symmetric (Gram) matrix product.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a):
        return a @ a.T


def get_inputs():
    a = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(a)]


def get_init_inputs():
    return []
""")

write(1, 15, "TriangularMatMulLower", """
class Model:
    \"\"\"Lower-triangular matrix times a dense matrix.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.tril(a) @ b


def get_inputs():
    a = np.random.randn(1024, 1024).astype(np.float32)
    b = np.random.randn(1024, 1024).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 16, "TriangularMatMulUpper", """
class Model:
    \"\"\"Upper-triangular matrix times a dense matrix.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.triu(a) @ b


def get_inputs():
    a = np.random.randn(1024, 1024).astype(np.float32)
    b = np.random.randn(1024, 1024).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 17, "OuterProduct", """
class Model:
    \"\"\"Outer product of two vectors.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.outer(a, b)


def get_inputs():
    a = np.random.randn(2048).astype(np.float32)
    b = np.random.randn(2048).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")


# ---- elementwise activations ----------------------------------------

def _ew(pid, name, doc, expr, shape="(4096, 4096)"):
    write(1, pid, name, f"""
class Model:
    \"\"\"{doc}\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return {expr}


def get_inputs():
    x = np.random.randn{shape}.astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")


_ew(18, "ReLU", "Rectified linear unit.", "jnp.maximum(x, 0.0)")
_ew(19, "GELU", "Gaussian error linear unit (tanh approximation).",
    "jax.nn.gelu(x, approximate=True)")
_ew(20, "LeakyReLU", "Leaky ReLU with negative slope 0.01.",
    "jnp.where(x >= 0, x, 0.01 * x)")
_ew(21, "Sigmoid", "Logistic sigmoid.", "jax.nn.sigmoid(x)")
_ew(22, "Tanh", "Hyperbolic tangent.", "jnp.tanh(x)")
_ew(23, "Softmax", "Row-wise softmax.", "jax.nn.softmax(x, axis=-1)")
_ew(24, "LogSumExp", "Row-wise log-sum-exp reduction.",
    "jax.scipy.special.logsumexp(x, axis=-1)")
_ew(25, "Softplus", "Softplus activation log(1 + e^x).",
    "jax.nn.softplus(x)")
_ew(26, "SiLU", "SiLU / swish activation.", "x * jax.nn.sigmoid(x)")
_ew(27, "ELU", "Exponential linear unit (alpha = 1).",
    "jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)")
_ew(28, "SELU", "Scaled exponential linear unit.", "jax.nn.selu(x)")
_ew(29, "HardTanh", "Hard tanh: clamp to [-1, 1].",
    "jnp.clip(x, -1.0, 1.0)")
_ew(30, "HardSigmoid", "Hard sigmoid: clamp(x / 6 + 0.5, 0, 1).",
    "jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)")
_ew(31, "HardSwish", "Hard swish: x * clamp(x / 6 + 0.5, 0, 1).",
    "x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)")
_ew(32, "Mish", "Mish activation: x * tanh(softplus(x)).",
    "x * jnp.tanh(jax.nn.softplus(x))")

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

_ew(34, "LogSoftmax", "Row-wise log-softmax.",
    "jax.nn.log_softmax(x, axis=-1)")
_ew(35, "GELUExact", "Gaussian error linear unit (erf form).",
    "jax.nn.gelu(x, approximate=False)")

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

write(1, 37, "BatchNormInference", """
class Model:
    \"\"\"Batch normalization at inference: fixed statistics (NCHW).\"\"\"

    def __init__(self, ch):
        self.gamma = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)
        self.beta = jnp.asarray(np.random.randn(ch).astype(np.float32))
        self.mean = jnp.asarray(np.random.randn(ch).astype(np.float32))
        self.var = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)

    def __call__(self, x):
        c = x.shape[1]
        shape = (1, c, 1, 1)
        return (
            (x - self.mean.reshape(shape))
            * jax.lax.rsqrt(self.var.reshape(shape) + 1e-5)
            * self.gamma.reshape(shape)
            + self.beta.reshape(shape)
        )


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
""")

write(1, 38, "InstanceNorm2d", """
class Model:
    \"\"\"Instance normalization over spatial dims (NCHW).\"\"\"

    def __init__(self, ch):
        self.gamma = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)
        self.beta = jnp.asarray(np.random.randn(ch).astype(np.float32))

    def __call__(self, x):
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        c = x.shape[1]
        return (
            (x - mean) * jax.lax.rsqrt(var + 1e-5)
            * self.gamma.reshape(1, c, 1, 1)
            + self.beta.reshape(1, c, 1, 1)
        )


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
""")

write(1, 39, "GroupNorm", """
class Model:
    \"\"\"Group normalization (NCHW, groups of channels).\"\"\"

    def __init__(self, ch, groups):
        self.groups = groups
        self.gamma = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)
        self.beta = jnp.asarray(np.random.randn(ch).astype(np.float32))

    def __call__(self, x):
        n, c, h, w = x.shape
        g = self.groups
        xg = x.reshape(n, g, c // g, h, w)
        mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
        xn = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, c, h, w)
        return xn * self.gamma.reshape(1, c, 1, 1) + self.beta.reshape(1, c, 1, 1)


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64, 8]
""")


# ---- reductions / scans ---------------------------------------------

_ew(40, "SumReduce", "Sum reduction over the last dimension.",
    "jnp.sum(x, axis=-1)")
_ew(41, "MeanReduce", "Mean reduction over the last dimension.",
    "jnp.mean(x, axis=-1)")
_ew(42, "MaxReduce", "Max reduction over the last dimension.",
    "jnp.max(x, axis=-1)")
_ew(43, "MinReduce", "Min reduction over the last dimension.",
    "jnp.min(x, axis=-1)")
_ew(44, "ProdReduce", "Product reduction over the last dimension.",
    "jnp.prod(x, axis=-1)", shape="(4096, 256)")
_ew(45, "CumSum", "Cumulative sum along the last dimension.",
    "jnp.cumsum(x, axis=-1)", shape="(2048, 4096)")
_ew(46, "CumProd", "Cumulative product along the last dimension.",
    "jnp.cumprod(x, axis=-1)", shape="(2048, 512)")
_ew(47, "ReverseCumSum", "Cumulative sum running from the end backwards.",
    "jnp.flip(jnp.cumsum(jnp.flip(x, axis=-1), axis=-1), axis=-1)",
    shape="(2048, 4096)")

write(1, 48, "MaskedCumSum", """
class Model:
    \"\"\"Cumulative sum of masked elements (mask zeroes excluded).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x, mask):
        return jnp.cumsum(jnp.where(mask, x, 0.0), axis=-1)


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    mask = (np.random.rand(2048, 4096) > 0.5)
    return [jnp.asarray(x), jnp.asarray(mask)]


def get_init_inputs():
    return []
""")

_ew(49, "Argmax", "Argmax over the last dimension.",
    "jnp.argmax(x, axis=-1)")
_ew(50, "Argmin", "Argmin over the last dimension.",
    "jnp.argmin(x, axis=-1)")


# ---- pooling ---------------------------------------------------------

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

write(1, 52, "AvgPool2d", """
class Model:
    \"\"\"2x2 average pooling, stride 2 (NCHW).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )
        return s / 4.0


def get_inputs():
    x = np.random.randn(16, 32, 128, 128).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 53, "MaxPool1d", """
class Model:
    \"\"\"1D max pooling, window 4 stride 4 (NCL).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 4), (1, 1, 4), "VALID"
        )


def get_inputs():
    x = np.random.randn(32, 64, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 54, "AvgPool1d", """
class Model:
    \"\"\"1D average pooling, window 4 stride 4 (NCL).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 4), (1, 1, 4), "VALID"
        )
        return s / 4.0


def get_inputs():
    x = np.random.randn(32, 64, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 55, "MaxPool3d", """
class Model:
    \"\"\"3D max pooling, 2x2x2 stride 2 (NCDHW).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, 1, 2, 2, 2), (1, 1, 2, 2, 2), "VALID"
        )


def get_inputs():
    x = np.random.randn(8, 16, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 56, "AvgPool3d", """
class Model:
    \"\"\"3D average pooling, 2x2x2 stride 2 (NCDHW).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2, 2), (1, 1, 2, 2, 2), "VALID"
        )
        return s / 8.0


def get_inputs():
    x = np.random.randn(8, 16, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")


# ---- convolutions ----------------------------------------------------

def _conv(pid, name, doc, call_body, inputs, init, init_args):
    write(1, pid, name, f"""
class Model:
    \"\"\"{doc}\"\"\"

    def __init__(self, {init}):
{textwrap.indent(textwrap.dedent(call_body[0]).strip(), "        ")}

    def __call__(self, x):
{textwrap.indent(textwrap.dedent(call_body[1]).strip(), "        ")}


def get_inputs():
    x = np.random.randn{inputs}.astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return {init_args}
""")


_conv(57, "Conv1d", "1D convolution (NCL, OIL weights, VALID padding).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    """),
    "(16, 32, 2048)", "in_ch, out_ch, ksize", "[32, 64, 5]")

_conv(58, "Conv1dStrided", "Strided 1D convolution (stride 2).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(2,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    """),
    "(16, 32, 2048)", "in_ch, out_ch, ksize", "[32, 64, 5]")

_conv(59, "Conv1dDilated", "Dilated 1D convolution (dilation 4).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1,), padding="VALID",
        rhs_dilation=(4,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    """),
    "(16, 32, 2048)", "in_ch, out_ch, ksize", "[32, 64, 5]")

_conv(60, "Conv2dStrided", "Strided 2D convolution (stride 2, NCHW).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 16, 64, 64)", "in_ch, out_ch, ksize", "[16, 32, 3]")

_conv(61, "Conv2dPadded", "2D convolution with SAME padding.", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 16, 64, 64)", "in_ch, out_ch, ksize", "[16, 32, 3]")

_conv(62, "Conv2dDilated", "Dilated 2D convolution (dilation 2).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1), padding="VALID",
        rhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 16, 64, 64)", "in_ch, out_ch, ksize", "[16, 32, 3]")

_conv(63, "Conv2dGrouped", "Grouped 2D convolution (4 feature groups).", (
    """
    self.groups = groups
    scale = 1.0 / np.sqrt(in_ch // groups * ksize * ksize)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch // groups, ksize, ksize) * scale)
        .astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1), padding="VALID",
        feature_group_count=self.groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 32, 64, 64)", "in_ch, out_ch, ksize, groups", "[32, 64, 3, 4]")

_conv(64, "DepthwiseConv2d", "Depthwise 2D convolution (one filter per channel).", (
    """
    self.ch = ch
    scale = 1.0 / np.sqrt(ksize * ksize)
    self.w = jnp.asarray(
        (np.random.randn(ch, 1, ksize, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1), padding="SAME",
        feature_group_count=self.ch,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 32, 64, 64)", "ch, ksize", "[32, 3]")

_conv(65, "PointwiseConv2d", "Pointwise (1x1) 2D convolution.", (
    """
    scale = 1.0 / np.sqrt(in_ch)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, 1, 1) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 64, 64, 64)", "in_ch, out_ch", "[64, 128]")

_conv(66, "Conv2dAsymmetric", "2D convolution with an asymmetric 1x7 kernel.", (
    """
    scale = 1.0 / np.sqrt(in_ch * 7)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, 1, 7) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 16, 64, 64)", "in_ch, out_ch", "[16, 32]")

_conv(67, "Conv3d", "3D convolution (NCDHW, VALID padding).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize ** 3)
    self.w = jnp.asarray(
        (np.random.randn(out_ch, in_ch, ksize, ksize, ksize) * scale)
        .astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_general_dilated(
        x, self.w, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    """),
    "(4, 8, 16, 32, 32)", "in_ch, out_ch, ksize", "[8, 16, 3]")

_conv(68, "ConvTranspose1d", "Transposed 1D convolution (stride 2).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize)
    self.w = jnp.asarray(
        (np.random.randn(in_ch, out_ch, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_transpose(
        x, self.w, strides=(2,), padding="VALID",
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    """),
    "(16, 32, 1024)", "in_ch, out_ch, ksize", "[32, 16, 4]")

_conv(69, "ConvTranspose2d", "Transposed 2D convolution (stride 2, NCHW).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize * ksize)
    self.w = jnp.asarray(
        (np.random.randn(in_ch, out_ch, ksize, ksize) * scale).astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_transpose(
        x, self.w, strides=(2, 2), padding="VALID",
        dimension_numbers=("NCHW", "IOHW", "NCHW"),
    )
    """),
    "(8, 32, 32, 32)", "in_ch, out_ch, ksize", "[32, 16, 4]")

_conv(70, "ConvTranspose3d", "Transposed 3D convolution (stride 2, NCDHW).", (
    """
    scale = 1.0 / np.sqrt(in_ch * ksize ** 3)
    self.w = jnp.asarray(
        (np.random.randn(in_ch, out_ch, ksize, ksize, ksize) * scale)
        .astype(np.float32)
    )
    """,
    """
    return jax.lax.conv_transpose(
        x, self.w, strides=(2, 2, 2), padding="VALID",
        dimension_numbers=("NCDHW", "IODHW", "NCDHW"),
    )
    """),
    "(2, 16, 8, 16, 16)", "in_ch, out_ch, ksize", "[16, 8, 2]")

_conv(71, "DepthwiseSeparableConv2d",
      "Depthwise-separable convolution: depthwise 3x3 then pointwise 1x1.", (
    """
    self.ch = in_ch
    s1 = 1.0 / np.sqrt(9)
    s2 = 1.0 / np.sqrt(in_ch)
    self.dw = jnp.asarray(
        (np.random.randn(in_ch, 1, 3, 3) * s1).astype(np.float32)
    )
    self.pw = jnp.asarray(
        (np.random.randn(out_ch, in_ch, 1, 1) * s2).astype(np.float32)
    )
    """,
    """
    x = jax.lax.conv_general_dilated(
        x, self.dw, (1, 1), "SAME", feature_group_count=self.ch,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return jax.lax.conv_general_dilated(
        x, self.pw, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    """),
    "(8, 32, 64, 64)", "in_ch, out_ch", "[32, 64]")


# ---- losses ----------------------------------------------------------

_ew(72, "Softsign", "Softsign activation x / (1 + |x|).",
    "x / (1.0 + jnp.abs(x))")

write(1, 73, "CrossEntropyLoss", """
class Model:
    \"\"\"Mean cross-entropy between logits and integer labels.\"\"\"

    def __init__(self):
        pass

    def __call__(self, logits, labels):
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        return -jnp.mean(picked)


def get_inputs():
    logits = np.random.randn(4096, 1024).astype(np.float32)
    labels = np.random.randint(0, 1024, size=(4096,))
    return [jnp.asarray(logits), jnp.asarray(labels)]


def get_init_inputs():
    return []
""")

write(1, 74, "MSELoss", """
class Model:
    \"\"\"Mean squared error.\"\"\"

    def __init__(self):
        pass

    def __call__(self, pred, target):
        return jnp.mean(jnp.square(pred - target))


def get_inputs():
    pred = np.random.randn(4096, 1024).astype(np.float32)
    target = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
""")

write(1, 75, "L1Loss", """
class Model:
    \"\"\"Mean absolute error.\"\"\"

    def __init__(self):
        pass

    def __call__(self, pred, target):
        return jnp.mean(jnp.abs(pred - target))


def get_inputs():
    pred = np.random.randn(4096, 1024).astype(np.float32)
    target = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
""")

write(1, 76, "SmoothL1Loss", """
class Model:
    \"\"\"Smooth L1 (beta = 1): quadratic near zero, linear in the tails.\"\"\"

    def __init__(self):
        pass

    def __call__(self, pred, target):
        d = jnp.abs(pred - target)
        return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def get_inputs():
    pred = np.random.randn(4096, 1024).astype(np.float32)
    target = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
""")

write(1, 77, "HuberLoss", """
class Model:
    \"\"\"Huber loss with delta = 2.\"\"\"

    def __init__(self):
        pass

    def __call__(self, pred, target):
        d = jnp.abs(pred - target)
        delta = 2.0
        return jnp.mean(
            jnp.where(d < delta, 0.5 * d * d, delta * (d - 0.5 * delta))
        )


def get_inputs():
    pred = np.random.randn(4096, 1024).astype(np.float32)
    target = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
""")

write(1, 78, "HingeLoss", """
class Model:
    \"\"\"Mean hinge loss for +-1 labels.\"\"\"

    def __init__(self):
        pass

    def __call__(self, pred, target):
        return jnp.mean(jnp.maximum(0.0, 1.0 - pred * target))


def get_inputs():
    pred = np.random.randn(65536).astype(np.float32)
    target = np.sign(np.random.randn(65536)).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
""")

write(1, 79, "KLDivLoss", """
class Model:
    \"\"\"KL divergence between two row-distributions (mean over rows).\"\"\"

    def __init__(self):
        pass

    def __call__(self, p_logits, q_logits):
        logp = jax.nn.log_softmax(p_logits, axis=-1)
        logq = jax.nn.log_softmax(q_logits, axis=-1)
        p = jnp.exp(logp)
        return jnp.mean(jnp.sum(p * (logp - logq), axis=-1))


def get_inputs():
    p = np.random.randn(4096, 512).astype(np.float32)
    q = np.random.randn(4096, 512).astype(np.float32)
    return [jnp.asarray(p), jnp.asarray(q)]


def get_init_inputs():
    return []
""")

write(1, 80, "CosineSimilarity", """
class Model:
    \"\"\"Row-wise cosine similarity between two batches of vectors.\"\"\"

    def __init__(self):
        pass

    def __call__(self, a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        return num / jnp.maximum(den, 1e-8)


def get_inputs():
    a = np.random.randn(4096, 512).astype(np.float32)
    b = np.random.randn(4096, 512).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 81, "TripletMarginLoss", """
class Model:
    \"\"\"Triplet margin loss (margin = 1, euclidean).\"\"\"

    def __init__(self):
        pass

    def __call__(self, anchor, pos, neg):
        dp = jnp.linalg.norm(anchor - pos, axis=-1)
        dn = jnp.linalg.norm(anchor - neg, axis=-1)
        return jnp.mean(jnp.maximum(dp - dn + 1.0, 0.0))


def get_inputs():
    a = np.random.randn(4096, 256).astype(np.float32)
    p = np.random.randn(4096, 256).astype(np.float32)
    n = np.random.randn(4096, 256).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)]


def get_init_inputs():
    return []
""")

_ew(82, "FrobeniusNorm", "Frobenius norm of a matrix.",
    "jnp.sqrt(jnp.sum(jnp.square(x)))")
_ew(83, "L1Normalize", "Normalize rows to unit L1 norm.",
    "x / jnp.maximum(jnp.sum(jnp.abs(x), axis=-1, keepdims=True), 1e-8)")
_ew(84, "L2Normalize", "Normalize rows to unit L2 norm.",
    "x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)")
_ew(85, "MatrixScalarMul", "Multiply a matrix by a scalar.", "x * 3.14159")

write(1, 86, "DiagMatMul", """
class Model:
    \"\"\"Diagonal matrix times dense matrix: diag(d) @ B.\"\"\"

    def __init__(self):
        pass

    def __call__(self, d, b):
        return d[:, None] * b


def get_inputs():
    d = np.random.randn(2048).astype(np.float32)
    b = np.random.randn(2048, 2048).astype(np.float32)
    return [jnp.asarray(d), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

write(1, 87, "EmbeddingGather", """
class Model:
    \"\"\"Embedding table lookup.\"\"\"

    def __init__(self, vocab, dim):
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32)
        )

    def __call__(self, ids):
        return self.table[ids]


def get_inputs():
    ids = np.random.randint(0, 32768, size=(64, 512))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [32768, 512]
""")

write(1, 88, "ScatterAdd", """
class Model:
    \"\"\"Scatter-add rows of updates into a zero table.\"\"\"

    def __init__(self, rows):
        self.rows = rows

    def __call__(self, idx, updates):
        out = jnp.zeros((self.rows, updates.shape[-1]), updates.dtype)
        return out.at[idx].add(updates)


def get_inputs():
    idx = np.random.randint(0, 1024, size=(8192,))
    upd = np.random.randn(8192, 256).astype(np.float32)
    return [jnp.asarray(idx), jnp.asarray(upd)]


def get_init_inputs():
    return [1024]
""")

_ew(89, "Sort", "Row-wise ascending sort.", "jnp.sort(x, axis=-1)",
    shape="(1024, 4096)")

write(1, 90, "TopK", """
class Model:
    \"\"\"Top-16 values per row (descending).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        vals, _ = jax.lax.top_k(x, 16)
        return vals


def get_inputs():
    x = np.random.randn(1024, 8192).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 91, "GatherRows", """
class Model:
    \"\"\"Gather rows of a matrix by index.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x, idx):
        return x[idx]


def get_inputs():
    x = np.random.randn(8192, 512).astype(np.float32)
    idx = np.random.randint(0, 8192, size=(4096,))
    return [jnp.asarray(x), jnp.asarray(idx)]


def get_init_inputs():
    return []
""")

write(1, 92, "Where", """
class Model:
    \"\"\"Elementwise select by predicate.\"\"\"

    def __init__(self):
        pass

    def __call__(self, cond, a, b):
        return jnp.where(cond, a, b)


def get_inputs():
    c = np.random.rand(4096, 1024) > 0.5
    a = np.random.randn(4096, 1024).astype(np.float32)
    b = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(c), jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
""")

_ew(93, "Flip", "Reverse the last dimension.", "jnp.flip(x, axis=-1)",
    shape="(2048, 4096)")

write(1, 94, "RotaryEmbedding", """
class Model:
    \"\"\"Apply rotary position embedding (split-half convention).\"\"\"

    def __init__(self, head_dim):
        self.head_dim = head_dim

    def __call__(self, x, positions):
        half = self.head_dim // 2
        freqs = 10000.0 ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
        ang = positions.astype(jnp.float32)[:, None] * freqs  # [S, half]
        cos = jnp.cos(ang)[None, :, None, :]
        sin = jnp.sin(ang)[None, :, None, :]
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )


def get_inputs():
    x = np.random.randn(8, 512, 16, 128).astype(np.float32)
    pos = np.arange(512)
    return [jnp.asarray(x), jnp.asarray(pos)]


def get_init_inputs():
    return [128]
""")

write(1, 95, "ExclusiveCumSum", """
class Model:
    \"\"\"Exclusive prefix sum along the last dimension.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        c = jnp.cumsum(x, axis=-1)
        return c - x


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 96, "SegmentSum", """
class Model:
    \"\"\"Sum rows into segments by id.\"\"\"

    def __init__(self, n_segments):
        self.n_segments = n_segments

    def __call__(self, x, seg):
        return jax.ops.segment_sum(x, seg, num_segments=self.n_segments)


def get_inputs():
    x = np.random.randn(16384, 256).astype(np.float32)
    seg = np.sort(np.random.randint(0, 128, size=(16384,)))
    return [jnp.asarray(x), jnp.asarray(seg)]


def get_init_inputs():
    return [128]
""")

write(1, 97, "OneHot", """
class Model:
    \"\"\"Integer ids to one-hot vectors.\"\"\"

    def __init__(self, depth):
        self.depth = depth

    def __call__(self, ids):
        return jax.nn.one_hot(ids, self.depth, dtype=jnp.float32)


def get_inputs():
    ids = np.random.randint(0, 512, size=(4096,))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [512]
""")

write(1, 98, "PadConstant", """
class Model:
    \"\"\"Zero-pad a 2D array by 16 on each side.\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.pad(x, ((16, 16), (16, 16)))


def get_inputs():
    x = np.random.randn(2048, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 99, "UpsampleNearest2x", """
class Model:
    \"\"\"Nearest-neighbor 2x spatial upsampling (NCHW).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def get_inputs():
    x = np.random.randn(8, 32, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

write(1, 100, "GlobalAvgPool2d", """
class Model:
    \"\"\"Global average pooling over spatial dims (NCHW -> NC).\"\"\"

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.mean(x, axis=(2, 3))


def get_inputs():
    x = np.random.randn(32, 256, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")


# ======================================================================
# Level 2 — 100 fused operator patterns (backbone + post-op chain)
# ======================================================================
#
# Each problem is a backbone op (matmul / conv / bmm) followed by a chain
# of post-ops, named exactly as its chain — the shape of the reference
# set's level 2 ("Conv2d_ReLU_BiasAdd_..."-style fusion problems).

import gen_problems_l2l3  # noqa: E402  (same directory; split for size)

gen_problems_l2l3.emit(write)

counts = {lvl: len(v) for lvl, v in _written.items()}
print("generated:", counts)
assert counts == {1: 100, 2: 100, 3: 50}, counts
