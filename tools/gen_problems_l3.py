"""Level-3 problems: 50 small full architectures (imported via
gen_problems_l2l3).  Each entry is (pid, name, body); bodies follow the
problem-file contract (Model / get_inputs / get_init_inputs, plain JAX)."""

ENTRIES = []


def _add(pid, name, body):
    ENTRIES.append((pid, name, body))


_add(1, "MLP", """
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

_add(2, "DeepMLP", """
class Model:
    \"\"\"Six-layer MLP with GELU activations and a narrow waist.\"\"\"

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
                x = jax.nn.gelu(x, approximate=True)
        return x


def get_inputs():
    x = np.random.randn(256, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[512, 1024, 512, 256, 512, 1024, 128]]
""")

_add(3, "GatedMLP", """
class Model:
    \"\"\"GEGLU feed-forward: (gelu(x Wg) * (x Wu)) Wd.\"\"\"

    def __init__(self, dim, hidden):
        s1 = 1.0 / np.sqrt(dim)
        s2 = 1.0 / np.sqrt(hidden)
        self.wg = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wu = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wd = jnp.asarray((np.random.randn(hidden, dim) * s2).astype(np.float32))

    def __call__(self, x):
        g = jax.nn.gelu(x @ self.wg, approximate=True)
        return (g * (x @ self.wu)) @ self.wd


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [1024, 2816]
""")

_add(4, "SwiGLUFFN", """
class Model:
    \"\"\"Pre-norm SwiGLU feed-forward with residual.\"\"\"

    def __init__(self, dim, hidden):
        s1 = 1.0 / np.sqrt(dim)
        s2 = 1.0 / np.sqrt(hidden)
        self.ln = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.wg = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wu = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wd = jnp.asarray((np.random.randn(hidden, dim) * s2).astype(np.float32))

    def __call__(self, x):
        h = x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6
        ) * self.ln
        g = h @ self.wg
        return x + ((g * jax.nn.sigmoid(g)) * (h @ self.wu)) @ self.wd


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [1024, 2816]
""")

_add(5, "TransformerBlock", """
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

_CONV_HELPERS = """
def _conv(x, w, stride=1, padding="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


def _cw(o, i, k):
    return jnp.asarray(
        (np.random.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32))
"""

_add(6, "LeNet", _CONV_HELPERS + """

class Model:
    \"\"\"LeNet-style conv net: two conv+pool stages, two linear layers.\"\"\"

    def __init__(self):
        self.w1 = _cw(6, 1, 5)
        self.w2 = _cw(16, 6, 5)
        self.f1 = _mat(16 * 8 * 8, 120)
        self.f2 = _mat(120, 10)

    def __call__(self, x):
        x = _maxpool(jnp.tanh(_conv(x, self.w1)))
        x = _maxpool(jnp.tanh(_conv(x, self.w2)))
        x = x.reshape(x.shape[0], -1)
        return jnp.tanh(x @ self.f1) @ self.f2


def get_inputs():
    x = np.random.randn(64, 1, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(7, "VGGBlock", _CONV_HELPERS + """

class Model:
    \"\"\"VGG-style double-conv block with pooling and a linear head.\"\"\"

    def __init__(self):
        self.w1 = _cw(32, 3, 3)
        self.w2 = _cw(32, 32, 3)
        self.w3 = _cw(64, 32, 3)
        self.w4 = _cw(64, 64, 3)
        self.head = _mat(64 * 8 * 8, 10)

    def __call__(self, x):
        x = jnp.maximum(_conv(x, self.w1), 0.0)
        x = _maxpool(jnp.maximum(_conv(x, self.w2), 0.0))
        x = jnp.maximum(_conv(x, self.w3), 0.0)
        x = _maxpool(jnp.maximum(_conv(x, self.w4), 0.0))
        return x.reshape(x.shape[0], -1) @ self.head


def get_inputs():
    x = np.random.randn(32, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(8, "AllConvNet", _CONV_HELPERS + """

class Model:
    \"\"\"All-convolutional net: strided convs replace pooling.\"\"\"

    def __init__(self):
        self.w1 = _cw(32, 3, 3)
        self.w2 = _cw(32, 32, 3)
        self.w3 = _cw(64, 32, 3)
        self.w4 = _cw(10, 64, 1)

    def __call__(self, x):
        x = jnp.maximum(_conv(x, self.w1), 0.0)
        x = jnp.maximum(_conv(x, self.w2, stride=2), 0.0)
        x = jnp.maximum(_conv(x, self.w3, stride=2), 0.0)
        x = _conv(x, self.w4)
        return jnp.mean(x, axis=(2, 3))


def get_inputs():
    x = np.random.randn(32, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(9, "ConvNet", """
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

_add(10, "NetworkInNetwork", _CONV_HELPERS + """

class Model:
    \"\"\"NiN: conv followed by two 1x1 convs (mlpconv), global pooling.\"\"\"

    def __init__(self):
        self.w1 = _cw(48, 3, 5)
        self.m1 = _cw(48, 48, 1)
        self.m2 = _cw(10, 48, 1)

    def __call__(self, x):
        x = jnp.maximum(_conv(x, self.w1), 0.0)
        x = jnp.maximum(_conv(x, self.m1), 0.0)
        x = _maxpool(x)
        x = _conv(x, self.m2)
        return jnp.mean(x, axis=(2, 3))


def get_inputs():
    x = np.random.randn(32, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(11, "ResNetBasicBlock", _CONV_HELPERS + """

class Model:
    \"\"\"ResNet basic block: two 3x3 convs with instance-norm and residual.\"\"\"

    def __init__(self, ch):
        self.w1 = _cw(ch, ch, 3)
        self.w2 = _cw(ch, ch, 3)

    def _norm(self, x):
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)

    def __call__(self, x):
        h = jnp.maximum(self._norm(_conv(x, self.w1)), 0.0)
        h = self._norm(_conv(h, self.w2))
        return jnp.maximum(x + h, 0.0)


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
""")

_add(12, "ResNetBottleneck", _CONV_HELPERS + """

class Model:
    \"\"\"ResNet bottleneck: 1x1 reduce -> 3x3 -> 1x1 expand + residual.\"\"\"

    def __init__(self, ch, mid):
        self.w1 = _cw(mid, ch, 1)
        self.w2 = _cw(mid, mid, 3)
        self.w3 = _cw(ch, mid, 1)

    def __call__(self, x):
        h = jnp.maximum(_conv(x, self.w1), 0.0)
        h = jnp.maximum(_conv(h, self.w2), 0.0)
        h = _conv(h, self.w3)
        return jnp.maximum(x + h, 0.0)


def get_inputs():
    x = np.random.randn(16, 128, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [128, 32]
""")

_add(13, "ResNetStack", _CONV_HELPERS + """

class Model:
    \"\"\"Stem conv + three residual blocks + pooled linear head.\"\"\"

    def __init__(self):
        self.stem = _cw(32, 3, 3)
        self.blocks = [(_cw(32, 32, 3), _cw(32, 32, 3)) for _ in range(3)]
        self.head = _mat(32, 10)

    def __call__(self, x):
        x = jnp.maximum(_conv(x, self.stem), 0.0)
        for w1, w2 in self.blocks:
            h = jnp.maximum(_conv(x, w1), 0.0)
            h = _conv(h, w2)
            x = jnp.maximum(x + h, 0.0)
        return jnp.mean(x, axis=(2, 3)) @ self.head


def get_inputs():
    x = np.random.randn(16, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(14, "DenseNetBlock", _CONV_HELPERS + """

class Model:
    \"\"\"DenseNet block: each conv consumes the concat of all prior maps.\"\"\"

    def __init__(self, ch, growth, layers):
        self.ws = [
            _cw(growth, ch + i * growth, 3) for i in range(layers)
        ]

    def __call__(self, x):
        feats = x
        for w in self.ws:
            h = jnp.maximum(_conv(feats, w), 0.0)
            feats = jnp.concatenate([feats, h], axis=1)
        return feats


def get_inputs():
    x = np.random.randn(8, 32, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 16, 4]
""")

_add(15, "FireModule", _CONV_HELPERS + """

class Model:
    \"\"\"SqueezeNet fire module: 1x1 squeeze, parallel 1x1/3x3 expand.\"\"\"

    def __init__(self, ch, squeeze, expand):
        self.ws = _cw(squeeze, ch, 1)
        self.we1 = _cw(expand, squeeze, 1)
        self.we3 = _cw(expand, squeeze, 3)

    def __call__(self, x):
        s = jnp.maximum(_conv(x, self.ws), 0.0)
        e1 = jnp.maximum(_conv(s, self.we1), 0.0)
        e3 = jnp.maximum(_conv(s, self.we3), 0.0)
        return jnp.concatenate([e1, e3], axis=1)


def get_inputs():
    x = np.random.randn(16, 96, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [96, 16, 64]
""")

_add(16, "MobileNetBlock", _CONV_HELPERS + """

class Model:
    \"\"\"MobileNet depthwise-separable block with fixed-stat batch norms.\"\"\"

    def __init__(self, ch, out):
        self.ch = ch
        self.dw = jnp.asarray(
            (np.random.randn(ch, 1, 3, 3) / 3.0).astype(np.float32))
        self.pw = _cw(out, ch, 1)
        self.m1 = jnp.asarray(np.random.randn(ch).astype(np.float32))
        self.v1 = jnp.asarray((np.random.rand(ch) + 0.5).astype(np.float32))
        self.m2 = jnp.asarray(np.random.randn(out).astype(np.float32))
        self.v2 = jnp.asarray((np.random.rand(out) + 0.5).astype(np.float32))

    def __call__(self, x):
        x = _conv(x, self.dw, groups=self.ch)
        x = (x - self.m1.reshape(1, -1, 1, 1)) * jax.lax.rsqrt(
            self.v1.reshape(1, -1, 1, 1) + 1e-5)
        x = jnp.maximum(x, 0.0)
        x = _conv(x, self.pw)
        x = (x - self.m2.reshape(1, -1, 1, 1)) * jax.lax.rsqrt(
            self.v2.reshape(1, -1, 1, 1) + 1e-5)
        return jnp.maximum(x, 0.0)


def get_inputs():
    x = np.random.randn(16, 32, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 64]
""")

_add(17, "InvertedResidual", _CONV_HELPERS + """

class Model:
    \"\"\"MobileNetV2 inverted residual: 1x1 expand, depthwise, 1x1 project.\"\"\"

    def __init__(self, ch, expand):
        self.mid = ch * expand
        self.we = _cw(self.mid, ch, 1)
        self.dw = jnp.asarray(
            (np.random.randn(self.mid, 1, 3, 3) / 3.0).astype(np.float32))
        self.wp = _cw(ch, self.mid, 1)

    def __call__(self, x):
        h = jnp.clip(_conv(x, self.we), 0.0, 6.0)
        h = jnp.clip(_conv(h, self.dw, groups=self.mid), 0.0, 6.0)
        return x + _conv(h, self.wp)


def get_inputs():
    x = np.random.randn(16, 32, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 4]
""")


_add(18, "InceptionModule", _CONV_HELPERS + """

class Model:
    \"\"\"Inception-style module: parallel 1x1 / 3x3 / 5x5 / pool branches.\"\"\"

    def __init__(self, ch):
        self.b1 = _cw(16, ch, 1)
        self.b3r = _cw(24, ch, 1)
        self.b3 = _cw(32, 24, 3)
        self.b5r = _cw(8, ch, 1)
        self.b5 = _cw(16, 8, 5)
        self.bp = _cw(16, ch, 1)

    def __call__(self, x):
        r1 = jnp.maximum(_conv(x, self.b1), 0.0)
        r3 = jnp.maximum(_conv(jnp.maximum(_conv(x, self.b3r), 0.0), self.b3), 0.0)
        r5 = jnp.maximum(_conv(jnp.maximum(_conv(x, self.b5r), 0.0), self.b5), 0.0)
        p = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME")
        rp = jnp.maximum(_conv(p, self.bp), 0.0)
        return jnp.concatenate([r1, r3, r5, rp], axis=1)


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
""")

_add(19, "UNetMini", _CONV_HELPERS + """

class Model:
    \"\"\"Two-scale U-Net: down conv+pool, bottleneck, upsample + skip.\"\"\"

    def __init__(self):
        self.d1 = _cw(16, 3, 3)
        self.d2 = _cw(32, 16, 3)
        self.up = _cw(16, 32, 3)
        self.out = _cw(8, 32, 3)

    def __call__(self, x):
        e1 = jnp.maximum(_conv(x, self.d1), 0.0)
        e2 = jnp.maximum(_conv(_maxpool(e1), self.d2), 0.0)
        u = jnp.repeat(jnp.repeat(e2, 2, axis=2), 2, axis=3)
        u = jnp.maximum(_conv(u, self.up), 0.0)
        cat = jnp.concatenate([u, e1], axis=1)
        return _conv(cat, self.out)


def get_inputs():
    x = np.random.randn(8, 3, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(20, "Autoencoder", """
class Model:
    \"\"\"Dense autoencoder: 1024 -> 64 bottleneck -> 1024.\"\"\"

    def __init__(self, dims):
        def mat(m, n):
            return jnp.asarray(
                (np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))

        self.enc = [mat(m, n) for m, n in zip(dims[:-1], dims[1:])]
        rev = dims[::-1]
        self.dec = [mat(m, n) for m, n in zip(rev[:-1], rev[1:])]

    def __call__(self, x):
        for w in self.enc:
            x = jnp.maximum(x @ w, 0.0)
        for i, w in enumerate(self.dec):
            x = x @ w
            if i < len(self.dec) - 1:
                x = jnp.maximum(x, 0.0)
        return x


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[1024, 512, 64]]
""")

_ATTN_HELPERS = """
def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))
"""

_add(21, "SingleHeadAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Single-head self-attention with projections.\"\"\"

    def __init__(self, dim):
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.dim = dim

    def __call__(self, x):
        q, k, v = x @ self.wq, x @ self.wk, x @ self.wv
        scores = q @ k.T / jnp.sqrt(jnp.float32(self.dim))
        return (jax.nn.softmax(scores, axis=-1) @ v) @ self.wo


def get_inputs():
    x = np.random.randn(1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256]
""")

_add(22, "MultiHeadAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Batched multi-head self-attention (bidirectional).\"\"\"

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, s, d = x.shape

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(x @ self.wq), split(x @ self.wk), split(x @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8]
""")

_add(23, "CausalSelfAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Causally-masked multi-head self-attention.\"\"\"

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wqkv = _mat(dim, 3 * dim)
        self.wo = _mat(dim, dim)

    def __call__(self, x):
        b, s, d = x.shape
        qkv = x @ self.wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
        o = jax.nn.softmax(scores, axis=-1) @ v
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8]
""")

_add(24, "GQAAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Grouped-query attention: 8 query heads share 2 KV heads.\"\"\"

    def __init__(self, dim, heads, kv_heads):
        self.h, self.kv = heads, kv_heads
        self.hd = dim // heads
        self.wq = _mat(dim, dim)
        self.wk = _mat(dim, self.kv * self.hd)
        self.wv = _mat(dim, self.kv * self.hd)
        self.wo = _mat(dim, dim)

    def __call__(self, x):
        b, s, d = x.shape
        g = self.h // self.kv
        q = (x @ self.wq).reshape(b, s, self.kv, g, self.hd)
        k = (x @ self.wk).reshape(b, s, self.kv, self.hd)
        v = (x @ self.wv).reshape(b, s, self.kv, self.hd)
        scores = jnp.einsum("bskgh,btkh->bkgst", q, k) / jnp.sqrt(
            jnp.float32(self.hd))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgst,btkh->bskgh", p, v).reshape(b, s, d)
        return o @ self.wo


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 2]
""")

_add(25, "CrossAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Cross-attention: queries from x, keys/values from a context.\"\"\"

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x, ctx):
        b, s, d = x.shape
        t = ctx.shape[1]

        def split(v, n):
            return v.reshape(b, n, self.h, self.hd).transpose(0, 2, 1, 3)

        q = split(x @ self.wq, s)
        k = split(ctx @ self.wk, t)
        v = split(ctx @ self.wv, t)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 128, 256).astype(np.float32)
    ctx = np.random.randn(8, 512, 256).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(ctx)]


def get_init_inputs():
    return [256, 8]
""")

_add(26, "TransformerEncoderLayer", _ATTN_HELPERS + """

class Model:
    \"\"\"Post-norm transformer encoder layer (MHA + FFN, layer norms).\"\"\"

    def __init__(self, dim, heads, hidden):
        self.h, self.hd = heads, dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))

    def _ln(self, x, g):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g

    def __call__(self, x):
        b, s, d = x.shape

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(x @ self.wq), split(x @ self.wk), split(x @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo
        x = self._ln(x + o, self.g1)
        h = jnp.maximum(x @ self.w1, 0.0) @ self.w2
        return self._ln(x + h, self.g2)


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 1024]
""")

_add(27, "TransformerDecoderLayer", _ATTN_HELPERS + """

class Model:
    \"\"\"Transformer decoder layer: causal self-attn + cross-attn + FFN.\"\"\"

    def __init__(self, dim, heads, hidden):
        self.h, self.hd = heads, dim // heads
        self.sq, self.sk, self.sv, self.so = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.cq, self.ck, self.cv, self.co = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)

    def _mha(self, q, k, v, causal):
        b, s, d = q.shape
        t = k.shape[1]

        def split(x, n):
            return x.reshape(b, n, self.h, self.hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, s), split(k, t), split(v, t)
        scores = qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        if causal:
            mask = jnp.tril(jnp.ones((s, t), dtype=bool))
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
        o = jax.nn.softmax(scores, axis=-1) @ vh
        return o.transpose(0, 2, 1, 3).reshape(b, s, d)

    def __call__(self, x, memory):
        x = x + self._mha(x @ self.sq, x @ self.sk, x @ self.sv, True) @ self.so
        x = x + self._mha(
            x @ self.cq, memory @ self.ck, memory @ self.cv, False) @ self.co
        return x + jnp.maximum(x @ self.w1, 0.0) @ self.w2


def get_inputs():
    x = np.random.randn(4, 128, 256).astype(np.float32)
    mem = np.random.randn(4, 256, 256).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(mem)]


def get_init_inputs():
    return [256, 8, 1024]
""")

_add(28, "ViTPatchEmbed", _ATTN_HELPERS + """

class Model:
    \"\"\"ViT front end: patchify, linear embed, cls token, encoder layer.\"\"\"

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
""")

_add(29, "MLPMixerBlock", _ATTN_HELPERS + """

class Model:
    \"\"\"MLP-Mixer block: token-mixing MLP then channel-mixing MLP.\"\"\"

    def __init__(self, tokens, dim, token_hidden, chan_hidden):
        self.t1, self.t2 = _mat(tokens, token_hidden), _mat(token_hidden, tokens)
        self.c1, self.c2 = _mat(dim, chan_hidden), _mat(chan_hidden, dim)
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))

    def _ln(self, x, g):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g

    def __call__(self, x):
        h = self._ln(x, self.g1).transpose(0, 2, 1)
        h = (jax.nn.gelu(h @ self.t1, approximate=True) @ self.t2)
        x = x + h.transpose(0, 2, 1)
        h = self._ln(x, self.g2)
        return x + jax.nn.gelu(h @ self.c1, approximate=True) @ self.c2


def get_inputs():
    x = np.random.randn(8, 256, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512, 1024, 2048]
""")

_add(30, "AttentionPooling", _ATTN_HELPERS + """

class Model:
    \"\"\"Learned-query attention pooling over a sequence.\"\"\"

    def __init__(self, dim):
        self.query = jnp.asarray((np.random.randn(1, dim) * 0.1).astype(np.float32))
        self.wk = _mat(dim, dim)
        self.wv = _mat(dim, dim)
        self.dim = dim

    def __call__(self, x):
        k = x @ self.wk
        v = x @ self.wv
        scores = self.query @ k.transpose(0, 2, 1)[...] / jnp.sqrt(
            jnp.float32(self.dim))
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bqs,bsd->bqd", w, v)[:, 0]


def get_inputs():
    x = np.random.randn(16, 512, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256]
""")

_add(31, "RNNCell", _ATTN_HELPERS + """

class Model:
    \"\"\"Vanilla tanh RNN cell applied once.\"\"\"

    def __init__(self, inp, hidden):
        self.wx = _mat(inp, hidden)
        self.wh = _mat(hidden, hidden)
        self.b = jnp.asarray(np.zeros(hidden, dtype=np.float32))

    def __call__(self, x, h):
        return jnp.tanh(x @ self.wx + h @ self.wh + self.b)


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    h = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(h)]


def get_init_inputs():
    return [512, 1024]
""")

_add(32, "LSTMCell", _ATTN_HELPERS + """

class Model:
    \"\"\"LSTM cell applied once (returns the new hidden state).\"\"\"

    def __init__(self, inp, hidden):
        self.wx = _mat(inp, 4 * hidden)
        self.wh = _mat(hidden, 4 * hidden)
        self.b = jnp.asarray(np.zeros(4 * hidden, dtype=np.float32))

    def __call__(self, x, h, c):
        z = x @ self.wx + h @ self.wh + self.b
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c2)


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    h = np.random.randn(512, 768).astype(np.float32)
    c = np.random.randn(512, 768).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(h), jnp.asarray(c)]


def get_init_inputs():
    return [512, 768]
""")

_add(33, "GRUCell", _ATTN_HELPERS + """

class Model:
    \"\"\"GRU cell applied once.\"\"\"

    def __init__(self, inp, hidden):
        self.wx = _mat(inp, 3 * hidden)
        self.wh = _mat(hidden, 3 * hidden)

    def __call__(self, x, h):
        zx = x @ self.wx
        zh = h @ self.wh
        xr, xz, xn = jnp.split(zx, 3, axis=-1)
        hr, hz, hn = jnp.split(zh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    h = np.random.randn(512, 768).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(h)]


def get_init_inputs():
    return [512, 768]
""")

_add(34, "LSTMSequence", _ATTN_HELPERS + """

class Model:
    \"\"\"LSTM unrolled over a sequence with lax.scan.\"\"\"

    def __init__(self, inp, hidden):
        self.hidden = hidden
        self.wx = _mat(inp, 4 * hidden)
        self.wh = _mat(hidden, 4 * hidden)

    def __call__(self, x):
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), jnp.float32)
        c0 = jnp.zeros((b, self.hidden), jnp.float32)

        def step(carry, xt):
            h, c = carry
            z = xt @ self.wx + h @ self.wh
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2

        _, hs = jax.lax.scan(step, (h0, c0), x.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


def get_inputs():
    x = np.random.randn(64, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512]
""")


_add(35, "GRUSequence", _ATTN_HELPERS + """

class Model:
    \"\"\"GRU unrolled over a sequence with lax.scan.\"\"\"

    def __init__(self, inp, hidden):
        self.hidden = hidden
        self.wx = _mat(inp, 3 * hidden)
        self.wh = _mat(hidden, 3 * hidden)

    def __call__(self, x):
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), jnp.float32)

        def step(h, xt):
            zx = xt @ self.wx
            zh = h @ self.wh
            xr, xz, xn = jnp.split(zx, 3, axis=-1)
            hr, hz, hn = jnp.split(zh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h2 = (1.0 - z) * n + z * h
            return h2, h2

        _, hs = jax.lax.scan(step, h0, x.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


def get_inputs():
    x = np.random.randn(64, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512]
""")

_C1_HELPERS = """
def _conv1d(x, w, dilation=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))


def _c1w(o, i, k):
    return jnp.asarray(
        (np.random.randn(o, i, k) / np.sqrt(i * k)).astype(np.float32))
"""

_add(36, "TCNBlock", _C1_HELPERS + """

class Model:
    \"\"\"Temporal conv block: two dilated causal conv1d + residual.\"\"\"

    def __init__(self, ch, dilation):
        self.d = dilation
        self.w1 = _c1w(ch, ch, 3)
        self.w2 = _c1w(ch, ch, 3)

    def _causal(self, x, w):
        pad = 2 * self.d
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        return _conv1d(xp, w, dilation=self.d, padding="VALID")

    def __call__(self, x):
        h = jnp.maximum(self._causal(x, self.w1), 0.0)
        h = jnp.maximum(self._causal(h, self.w2), 0.0)
        return x + h


def get_inputs():
    x = np.random.randn(16, 64, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64, 4]
""")

_add(37, "WaveNetBlock", _C1_HELPERS + """

class Model:
    \"\"\"WaveNet residual block: gated dilated conv with skip output.\"\"\"

    def __init__(self, ch, dilation):
        self.d = dilation
        self.wf = _c1w(ch, ch, 2)
        self.wg = _c1w(ch, ch, 2)
        self.wr = _c1w(ch, ch, 1)
        self.ws = _c1w(ch, ch, 1)

    def __call__(self, x):
        pad = self.d
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        f = jnp.tanh(_conv1d(xp, self.wf, dilation=self.d, padding="VALID"))
        g = jax.nn.sigmoid(
            _conv1d(xp, self.wg, dilation=self.d, padding="VALID"))
        z = f * g
        res = x + _conv1d(z, self.wr)
        skip = _conv1d(z, self.ws)
        return res + skip


def get_inputs():
    x = np.random.randn(8, 64, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64, 8]
""")

_add(38, "Conv1dStack", _C1_HELPERS + """

class Model:
    \"\"\"Stack of widening conv1d + pool stages with a linear head.\"\"\"

    def __init__(self):
        self.w1 = _c1w(32, 8, 5)
        self.w2 = _c1w(64, 32, 5)
        self.w3 = _c1w(128, 64, 3)
        self.head = jnp.asarray(
            (np.random.randn(128, 10) / np.sqrt(128)).astype(np.float32))

    def _pool(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 4), (1, 1, 4), "VALID")

    def __call__(self, x):
        x = self._pool(jnp.maximum(_conv1d(x, self.w1), 0.0))
        x = self._pool(jnp.maximum(_conv1d(x, self.w2), 0.0))
        x = jnp.maximum(_conv1d(x, self.w3), 0.0)
        return jnp.mean(x, axis=-1) @ self.head


def get_inputs():
    x = np.random.randn(32, 8, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
""")

_add(39, "TextCNN", _C1_HELPERS + """

class Model:
    \"\"\"Text CNN: embedding, parallel conv widths, max-over-time, linear.\"\"\"

    def __init__(self, vocab, dim):
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32))
        self.w3 = _c1w(64, dim, 3)
        self.w5 = _c1w(64, dim, 5)
        self.head = jnp.asarray(
            (np.random.randn(128, 4) / np.sqrt(128)).astype(np.float32))

    def __call__(self, ids):
        x = self.table[ids].transpose(0, 2, 1)  # [B, D, L]
        c3 = jnp.max(jnp.maximum(_conv1d(x, self.w3), 0.0), axis=-1)
        c5 = jnp.max(jnp.maximum(_conv1d(x, self.w5), 0.0), axis=-1)
        return jnp.concatenate([c3, c5], axis=-1) @ self.head


def get_inputs():
    ids = np.random.randint(0, 8192, size=(64, 256))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [8192, 128]
""")

_add(40, "BagOfWordsClassifier", """
class Model:
    \"\"\"Embedding mean-pool followed by a two-layer classifier.\"\"\"

    def __init__(self, vocab, dim):
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32))
        self.w1 = jnp.asarray(
            (np.random.randn(dim, 256) / np.sqrt(dim)).astype(np.float32))
        self.w2 = jnp.asarray(
            (np.random.randn(256, 16) / 16.0).astype(np.float32))

    def __call__(self, ids):
        x = jnp.mean(self.table[ids], axis=1)
        return jnp.maximum(x @ self.w1, 0.0) @ self.w2


def get_inputs():
    ids = np.random.randint(0, 16384, size=(128, 512))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [16384, 256]
""")

_TB_HELPERS = _ATTN_HELPERS + """

def _causal_mha(x, wq, wk, wv, wo, heads):
    b, s, d = x.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(x @ wq), split(x @ wk), split(x @ wv)
    scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(hd))
    mask = jnp.tril(jnp.ones((s, s), dtype=bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    o = jax.nn.softmax(scores, axis=-1) @ v
    return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ wo


def _rms(x, g):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6) * g
"""

_add(41, "PreNormTransformerStack", _TB_HELPERS + """

class Model:
    \"\"\"Two pre-norm causal transformer blocks.\"\"\"

    def __init__(self, dim, heads, hidden):
        self.heads = heads
        self.blocks = []
        for _ in range(2):
            self.blocks.append(dict(
                g1=jnp.asarray(np.ones(dim, dtype=np.float32)),
                g2=jnp.asarray(np.ones(dim, dtype=np.float32)),
                wq=_mat(dim, dim), wk=_mat(dim, dim),
                wv=_mat(dim, dim), wo=_mat(dim, dim),
                w1=_mat(dim, hidden), w2=_mat(hidden, dim),
            ))

    def __call__(self, x):
        for blk in self.blocks:
            h = _rms(x, blk["g1"])
            x = x + _causal_mha(
                h, blk["wq"], blk["wk"], blk["wv"], blk["wo"], self.heads)
            h = _rms(x, blk["g2"])
            x = x + jax.nn.gelu(h @ blk["w1"], approximate=True) @ blk["w2"]
        return x


def get_inputs():
    x = np.random.randn(4, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 1024]
""")

_add(42, "PostNormTransformerBlock", _TB_HELPERS + """

class Model:
    \"\"\"Post-norm causal transformer block (norm after residual).\"\"\"

    def __init__(self, dim, heads, hidden):
        self.heads = heads
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.wq, self.wk = _mat(dim, dim), _mat(dim, dim)
        self.wv, self.wo = _mat(dim, dim), _mat(dim, dim)
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)

    def __call__(self, x):
        x = _rms(x + _causal_mha(
            x, self.wq, self.wk, self.wv, self.wo, self.heads), self.g1)
        return _rms(
            x + jax.nn.gelu(x @ self.w1, approximate=True) @ self.w2, self.g2)


def get_inputs():
    x = np.random.randn(4, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 1024]
""")

_add(43, "TransformerLMHead", _TB_HELPERS + """

class Model:
    \"\"\"Tiny LM: embedding, one causal block, tied-embedding logits.\"\"\"

    def __init__(self, vocab, dim, heads, hidden):
        self.heads = heads
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32))
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.gf = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.wq, self.wk = _mat(dim, dim), _mat(dim, dim)
        self.wv, self.wo = _mat(dim, dim), _mat(dim, dim)
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)

    def __call__(self, ids):
        x = self.table[ids]
        h = _rms(x, self.g1)
        x = x + _causal_mha(
            h, self.wq, self.wk, self.wv, self.wo, self.heads)
        h = _rms(x, self.g2)
        x = x + jax.nn.gelu(h @ self.w1, approximate=True) @ self.w2
        return _rms(x, self.gf) @ self.table.T


def get_inputs():
    ids = np.random.randint(0, 2048, size=(4, 256))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [2048, 256, 8, 1024]
""")

_add(44, "SinusoidalPosTransformer", _TB_HELPERS + """

class Model:
    \"\"\"Sinusoidal positional encoding added before a causal block.\"\"\"

    def __init__(self, dim, heads, hidden):
        self.heads = heads
        self.dim = dim
        self.wq, self.wk = _mat(dim, dim), _mat(dim, dim)
        self.wv, self.wo = _mat(dim, dim), _mat(dim, dim)
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)

    def __call__(self, x):
        b, s, d = x.shape
        pos = jnp.arange(s, dtype=jnp.float32)[:, None]
        i = jnp.arange(d // 2, dtype=jnp.float32)[None, :]
        ang = pos / (10000.0 ** (2 * i / d))
        pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        x = x + pe[None]
        x = x + _causal_mha(
            x, self.wq, self.wk, self.wv, self.wo, self.heads)
        return x + jnp.maximum(x @ self.w1, 0.0) @ self.w2


def get_inputs():
    x = np.random.randn(4, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 1024]
""")

_add(45, "MoELayer", _ATTN_HELPERS + """

class Model:
    \"\"\"Dense mixture-of-experts: softmax routing over 4 expert FFNs.\"\"\"

    def __init__(self, dim, hidden, experts):
        self.router = _mat(dim, experts)
        self.w1 = jnp.asarray(
            (np.random.randn(experts, dim, hidden) / np.sqrt(dim))
            .astype(np.float32))
        self.w2 = jnp.asarray(
            (np.random.randn(experts, hidden, dim) / np.sqrt(hidden))
            .astype(np.float32))

    def __call__(self, x):
        gates = jax.nn.softmax(x @ self.router, axis=-1)  # [T, E]
        h = jnp.einsum("td,edh->teh", x, self.w1)
        h = jnp.maximum(h, 0.0)
        y = jnp.einsum("teh,ehd->ted", h, self.w2)
        return jnp.einsum("te,ted->td", gates, y)


def get_inputs():
    x = np.random.randn(1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512, 4]
""")

_add(46, "WindowAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Swin-style non-overlapping window self-attention.\"\"\"

    def __init__(self, dim, window, heads):
        self.win = window
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, s, d = x.shape
        w = self.win
        nw = s // w
        xw = x.reshape(b * nw, w, d)

        def split(t):
            return t.reshape(b * nw, w, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(xw @ self.wq), split(xw @ self.wk), split(xw @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return o @ self.wo


def get_inputs():
    x = np.random.randn(8, 1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 64, 8]
""")

_add(47, "LinearAttention", _ATTN_HELPERS + """

class Model:
    \"\"\"Linear attention: phi(q) (phi(k)^T v) with elu+1 feature map.\"\"\"

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, s, d = x.shape

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        def phi(t):
            return jnp.where(t > 0, t + 1.0,
                             jnp.exp(jnp.minimum(t, 0.0)))

        q = phi(split(x @ self.wq))
        k = phi(split(x @ self.wk))
        v = split(x @ self.wv)
        kv = jnp.einsum("bhsk,bhsv->bhkv", k, v)
        z = 1.0 / (jnp.einsum("bhsk,bhk->bhs", q, jnp.sum(k, axis=2)) + 1e-6)
        o = jnp.einsum("bhsk,bhkv->bhsv", q, kv) * z[..., None]
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8]
""")

_add(48, "GraphConv", _ATTN_HELPERS + """

class Model:
    \"\"\"Two-layer graph convolution: A_norm @ X @ W with ReLU.\"\"\"

    def __init__(self, dim, hidden, classes):
        self.w1 = _mat(dim, hidden)
        self.w2 = _mat(hidden, classes)

    def __call__(self, adj, x):
        deg = jnp.sum(adj, axis=-1)
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-6))
        a = adj * dinv[:, None] * dinv[None, :]
        h = jnp.maximum(a @ (x @ self.w1), 0.0)
        return a @ (h @ self.w2)


def get_inputs():
    adj = (np.random.rand(1024, 1024) < 0.01).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 1.0)
    x = np.random.randn(1024, 256).astype(np.float32)
    return [jnp.asarray(adj), jnp.asarray(x)]


def get_init_inputs():
    return [256, 128, 16]
""")

_add(49, "SirenNet", _ATTN_HELPERS + """

class Model:
    \"\"\"SIREN: MLP with sine activations and omega scaling.\"\"\"

    def __init__(self, dims, omega):
        self.omega = omega
        self.ws = [
            _mat(m, n) for m, n in zip(dims[:-1], dims[1:])
        ]

    def __call__(self, x):
        for i, w in enumerate(self.ws):
            x = x @ w
            if i < len(self.ws) - 1:
                x = jnp.sin(self.omega * x)
        return x


def get_inputs():
    x = np.random.randn(4096, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[64, 256, 256, 256, 3], 30.0]
""")

_add(50, "HighwayNetwork", _ATTN_HELPERS + """

class Model:
    \"\"\"Three highway layers: gated mix of transform and carry.\"\"\"

    def __init__(self, dim, layers):
        self.ws = [_mat(dim, dim) for _ in range(layers)]
        self.wt = [_mat(dim, dim) for _ in range(layers)]

    def __call__(self, x):
        for w, wt in zip(self.ws, self.wt):
            h = jnp.maximum(x @ w, 0.0)
            t = jax.nn.sigmoid(x @ wt - 1.0)
            x = h * t + x * (1.0 - t)
        return x


def get_inputs():
    x = np.random.randn(1024, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [512, 3]
""")


def emit_l3(write):
    for pid, name, body in ENTRIES:
        write(3, pid, name, body)
