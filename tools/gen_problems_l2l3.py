"""Level-2 and level-3 problem emitters (imported by gen_problems.py).

Level 2: a backbone op + a chain of post-ops, composed from the component
library below with shape tracking, named as the chain.
Level 3: 50 small full-architecture templates.
"""

import textwrap

# ----------------------------------------------------------------------
# Level 2 component library
# ----------------------------------------------------------------------
# A backbone returns (input_shape, out_shape, init_code, call_code).
# Post-ops are functions (shape, ctx) -> (new_shape, init_code, call_code).
# ctx collects unique param names.

BACKBONES = {
    "Gemm": dict(
        inp="(256, 1024)",
        out=(256, 512),
        init="""
            scale = 1.0 / np.sqrt(1024)
            self.w = jnp.asarray(
                (np.random.randn(1024, 512) * scale).astype(np.float32))
        """,
        call="x = x @ self.w",
    ),
    "Matmul3d": dict(
        inp="(8, 256, 512)",
        out=(8, 256, 512),
        init="""
            scale = 1.0 / np.sqrt(512)
            self.w = jnp.asarray(
                (np.random.randn(512, 512) * scale).astype(np.float32))
        """,
        call="x = jnp.einsum(\"bsk,kn->bsn\", x, self.w)",
    ),
    "BMM": dict(
        inp="(16, 128, 256)",
        out=(16, 128, 128),
        init="""
            scale = 1.0 / np.sqrt(256)
            self.w = jnp.asarray(
                (np.random.randn(16, 256, 128) * scale).astype(np.float32))
        """,
        call="x = jnp.einsum(\"bij,bjk->bik\", x, self.w)",
    ),
    "Conv2d": dict(
        inp="(8, 16, 32, 32)",
        out=(8, 32, 32, 32),
        init="""
            scale = 1.0 / np.sqrt(16 * 9)
            self.w = jnp.asarray(
                (np.random.randn(32, 16, 3, 3) * scale).astype(np.float32))
        """,
        call="""
            x = jax.lax.conv_general_dilated(
                x, self.w, (1, 1), "SAME",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        """,
    ),
    "Conv1d": dict(
        inp="(16, 32, 1024)",
        out=(16, 64, 1024),
        init="""
            scale = 1.0 / np.sqrt(32 * 5)
            self.w = jnp.asarray(
                (np.random.randn(64, 32, 5) * scale).astype(np.float32))
        """,
        call="""
            x = jax.lax.conv_general_dilated(
                x, self.w, (1,), "SAME",
                dimension_numbers=("NCH", "OIH", "NCH"))
        """,
    ),
    "ConvT2d": dict(
        inp="(8, 32, 16, 16)",
        out=(8, 16, 32, 32),
        init="""
            scale = 1.0 / np.sqrt(32 * 16)
            self.w = jnp.asarray(
                (np.random.randn(32, 16, 4, 4) * scale).astype(np.float32))
        """,
        call="""
            x = jax.lax.conv_transpose(
                x, self.w, strides=(2, 2), padding="SAME",
                dimension_numbers=("NCHW", "IOHW", "NCHW"))
        """,
    ),
    "DWConv2d": dict(
        inp="(8, 32, 32, 32)",
        out=(8, 32, 32, 32),
        init="""
            scale = 1.0 / np.sqrt(9)
            self.w = jnp.asarray(
                (np.random.randn(32, 1, 3, 3) * scale).astype(np.float32))
        """,
        call="""
            x = jax.lax.conv_general_dilated(
                x, self.w, (1, 1), "SAME", feature_group_count=32,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
        """,
    ),
    "Conv3d": dict(
        inp="(4, 8, 8, 16, 16)",
        out=(4, 16, 8, 16, 16),
        init="""
            scale = 1.0 / np.sqrt(8 * 27)
            self.w = jnp.asarray(
                (np.random.randn(16, 8, 3, 3, 3) * scale).astype(np.float32))
        """,
        call="""
            x = jax.lax.conv_general_dilated(
                x, self.w, (1, 1, 1), "SAME",
                dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        """,
    ),
}


def _op_ew(expr, doc=None):
    def op(shape, ctx):
        return shape, "", f"x = {expr}"
    return op


def _op_bias(shape, ctx):
    # bias over the channel/feature axis: axis 1 for rank>=3, -1 for rank 2
    n = ctx["n"]
    ctx["n"] += 1
    if len(shape) == 2:
        f = shape[-1]
        init = (f"self.bias{n} = jnp.asarray("
                f"np.random.randn({f}).astype(np.float32))")
        call = f"x = x + self.bias{n}"
    elif ctx.get("bias_axis") == "last":
        # sequence tensors ([B, S, D] matmul outputs): bias the feature
        # (last) axis, matching the linear-layer convention
        f = shape[-1]
        init = (f"self.bias{n} = jnp.asarray("
                f"np.random.randn({f}).astype(np.float32))")
        call = f"x = x + self.bias{n}"
    else:
        c = shape[1]
        bshape = "(1, {}, {})".format(c, ", ".join(["1"] * (len(shape) - 2)))
        init = (f"self.bias{n} = jnp.asarray("
                f"np.random.randn({c}).astype(np.float32))")
        call = f"x = x + self.bias{n}.reshape{bshape}"
    return shape, init, call


def _op_residual(shape, ctx):
    # adds the value captured right after the backbone (x0)
    ctx["need_x0"] = True
    return shape, "", "x = x + x0"


def _op_layernorm(shape, ctx):
    d = shape[-1]
    n = ctx["n"]
    ctx["n"] += 1
    init = (f"self.g{n} = jnp.asarray(np.ones({d}, dtype=np.float32))\n"
            f"self.b{n} = jnp.asarray(np.zeros({d}, dtype=np.float32))")
    call = (
        "mean = jnp.mean(x, axis=-1, keepdims=True)\n"
        "var = jnp.var(x, axis=-1, keepdims=True)\n"
        f"x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * self.g{n} + self.b{n}"
    )
    return shape, init, call


def _op_rmsnorm(shape, ctx):
    d = shape[-1]
    n = ctx["n"]
    ctx["n"] += 1
    init = f"self.g{n} = jnp.asarray(np.ones({d}, dtype=np.float32))"
    call = (
        "ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)\n"
        f"x = x * jax.lax.rsqrt(ms + 1e-6) * self.g{n}"
    )
    return shape, init, call


def _op_instnorm(shape, ctx):
    assert len(shape) == 4
    call = (
        "mean = jnp.mean(x, axis=(2, 3), keepdims=True)\n"
        "var = jnp.var(x, axis=(2, 3), keepdims=True)\n"
        "x = (x - mean) * jax.lax.rsqrt(var + 1e-5)"
    )
    return shape, "", call


def _op_groupnorm(shape, ctx):
    assert len(shape) == 4
    n_, c, h, w = shape
    g = 8 if c % 8 == 0 else 4
    call = (
        f"n, c, h, w = x.shape\n"
        f"xg = x.reshape(n, {g}, c // {g}, h, w)\n"
        "mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)\n"
        "var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)\n"
        "x = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, c, h, w)"
    )
    return shape, "", call


def _op_batchnorm(shape, ctx):
    assert len(shape) >= 3
    c = shape[1]
    n = ctx["n"]
    ctx["n"] += 1
    ones = ", ".join(["1"] * (len(shape) - 2))
    init = (
        f"self.bn_m{n} = jnp.asarray(np.random.randn({c}).astype(np.float32))\n"
        f"self.bn_v{n} = jnp.asarray((np.random.rand({c}) + 0.5).astype(np.float32))"
    )
    call = (
        f"x = (x - self.bn_m{n}.reshape(1, {c}, {ones})) "
        f"* jax.lax.rsqrt(self.bn_v{n}.reshape(1, {c}, {ones}) + 1e-5)"
    )
    return shape, init, call


def _op_maxpool(shape, ctx):
    assert len(shape) == 4
    new = (shape[0], shape[1], shape[2] // 2, shape[3] // 2)
    call = ("x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, "
            "(1, 1, 2, 2), (1, 1, 2, 2), \"VALID\")")
    return new, "", call


def _op_avgpool(shape, ctx):
    assert len(shape) == 4
    new = (shape[0], shape[1], shape[2] // 2, shape[3] // 2)
    call = ("x = jax.lax.reduce_window(x, 0.0, jax.lax.add, "
            "(1, 1, 2, 2), (1, 1, 2, 2), \"VALID\") / 4.0")
    return new, "", call


def _op_gap(shape, ctx):
    assert len(shape) >= 3
    axes = tuple(range(2, len(shape)))
    return shape[:2], "", f"x = jnp.mean(x, axis={axes})"


def _op_sum(shape, ctx):
    return shape[:-1], "", "x = jnp.sum(x, axis=-1)"


def _op_mean(shape, ctx):
    return shape[:-1], "", "x = jnp.mean(x, axis=-1)"


def _op_max(shape, ctx):
    return shape[:-1], "", "x = jnp.max(x, axis=-1)"


def _op_lse(shape, ctx):
    return shape[:-1], "", \
        "x = jax.scipy.special.logsumexp(x, axis=-1)"


OPS = {
    "ReLU": _op_ew("jnp.maximum(x, 0.0)"),
    "GELU": _op_ew("jax.nn.gelu(x, approximate=True)"),
    "SiLU": _op_ew("x * jax.nn.sigmoid(x)"),
    "Sigmoid": _op_ew("jax.nn.sigmoid(x)"),
    "Tanh": _op_ew("jnp.tanh(x)"),
    "LeakyReLU": _op_ew("jnp.where(x >= 0, x, 0.01 * x)"),
    "ELU": _op_ew(
        "jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)"),
    "HardTanh": _op_ew("jnp.clip(x, -1.0, 1.0)"),
    "Mish": _op_ew("x * jnp.tanh(jax.nn.softplus(x))"),
    "Softplus": _op_ew("jax.nn.softplus(x)"),
    "HardSwish": _op_ew("x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)"),
    "Abs": _op_ew("jnp.abs(x)"),
    "Scale": _op_ew("x * 0.5"),
    "Clamp": _op_ew("jnp.clip(x, -2.0, 2.0)"),
    "Softmax": _op_ew("jax.nn.softmax(x, axis=-1)"),
    "LogSoftmax": _op_ew("jax.nn.log_softmax(x, axis=-1)"),
    "BiasAdd": _op_bias,
    "Residual": _op_residual,
    "LayerNorm": _op_layernorm,
    "RMSNorm": _op_rmsnorm,
    "InstanceNorm": _op_instnorm,
    "GroupNorm": _op_groupnorm,
    "BatchNorm": _op_batchnorm,
    "MaxPool": _op_maxpool,
    "AvgPool": _op_avgpool,
    "GlobalAvgPool": _op_gap,
    "Sum": _op_sum,
    "Mean": _op_mean,
    "Max": _op_max,
    "LogSumExp": _op_lse,
}


def _emit_l2(write, pid, backbone, chain):
    bb = BACKBONES[backbone]
    ctx = {"n": 0, "need_x0": False,
           "bias_axis": "last" if backbone in ("Gemm", "Matmul3d", "BMM")
           else "channel"}
    shape = bb["out"]
    inits, calls = [], []
    for opname in chain:
        shape, init, call = OPS[opname](shape, ctx)
        if init:
            inits.append(init)
        calls.append(call)
    name = "_".join([backbone] + list(chain))
    doc = f"{backbone} followed by {', '.join(chain)}."

    init_code = textwrap.dedent(bb["init"]).strip()
    for i in inits:
        init_code += "\n" + i
    call_code = textwrap.dedent(bb["call"]).strip()
    if ctx["need_x0"]:
        call_code += "\nx0 = x"
    for c in calls:
        call_code += "\n" + c
    call_code += "\nreturn x"

    body = f"""
class Model:
    \"\"\"{doc}\"\"\"

    def __init__(self):
{textwrap.indent(init_code, "        ")}

    def __call__(self, x):
{textwrap.indent(call_code, "        ")}


def get_inputs():
    x = np.random.randn{bb["inp"]}.astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
"""
    write(2, pid, name, body)


#: (id, backbone, chain) — 100 curated fusion patterns
L2_CHAINS = [
    (1, "Gemm", ["ReLU"]),
    (2, "Gemm", ["BiasAdd", "ReLU"]),
    (3, "Gemm", ["BiasAdd", "GELU"]),
    (4, "Gemm", ["BiasAdd", "SiLU"]),
    (5, "Gemm", ["GELU", "Residual"]),
    (6, "Gemm", ["BiasAdd", "Tanh", "Scale"]),
    (7, "Gemm", ["LayerNorm", "ReLU"]),
    (8, "Gemm", ["RMSNorm", "SiLU"]),
    (9, "Gemm", ["BiasAdd", "Softmax"]),
    (10, "Gemm", ["BiasAdd", "LeakyReLU", "Clamp"]),
    (11, "Gemm", ["Scale", "Residual", "ReLU"]),
    (12, "Gemm", ["BiasAdd", "Mish"]),
    (13, "Gemm", ["BiasAdd", "HardSwish", "Scale"]),
    (14, "Gemm", ["LayerNorm", "GELU", "Residual"]),
    (15, "Gemm", ["BiasAdd", "Sigmoid", "Sum"]),
    (16, "Gemm", ["BiasAdd", "ReLU", "LogSumExp"]),
    (17, "Gemm", ["Softmax", "Max"]),
    (18, "Gemm", ["BiasAdd", "ELU", "Mean"]),
    (19, "Gemm", ["RMSNorm", "Residual", "LayerNorm"]),
    (20, "Gemm", ["BiasAdd", "Softplus", "Scale", "Residual"]),
    (21, "Gemm", ["Abs", "Mean"]),
    (22, "Gemm", ["BiasAdd", "HardTanh", "Sum"]),
    (23, "Gemm", ["LogSoftmax", "Max"]),
    (24, "Gemm", ["BiasAdd", "GELU", "LayerNorm"]),
    (25, "Gemm", ["SiLU", "RMSNorm", "Residual"]),
    (26, "Matmul3d", ["ReLU"]),
    (27, "Matmul3d", ["BiasAdd", "GELU"]),
    (28, "Matmul3d", ["LayerNorm", "Residual"]),
    (29, "Matmul3d", ["RMSNorm", "SiLU", "Residual"]),
    (30, "Matmul3d", ["Softmax"]),
    (31, "Matmul3d", ["BiasAdd", "Tanh", "Mean"]),
    (32, "Matmul3d", ["Scale", "Residual", "LayerNorm"]),
    (33, "Matmul3d", ["BiasAdd", "SiLU", "RMSNorm"]),
    (34, "Matmul3d", ["GELU", "Sum"]),
    (35, "Matmul3d", ["BiasAdd", "LeakyReLU", "Residual"]),
    (36, "BMM", ["ReLU"]),
    (37, "BMM", ["Softmax"]),
    (38, "BMM", ["Scale", "Tanh"]),
    (39, "BMM", ["LayerNorm", "GELU"]),
    (40, "BMM", ["BiasAdd", "Sigmoid", "Max"]),
    (41, "BMM", ["Softmax", "Mean"]),
    (42, "BMM", ["RMSNorm", "SiLU"]),
    (43, "BMM", ["ELU", "Sum"]),
    (44, "BMM", ["Clamp", "LogSumExp"]),
    (45, "BMM", ["BiasAdd", "Mish", "Scale"]),
    (46, "Conv2d", ["ReLU"]),
    (47, "Conv2d", ["BiasAdd", "ReLU"]),
    (48, "Conv2d", ["BiasAdd", "ReLU", "MaxPool"]),
    (49, "Conv2d", ["BatchNorm", "ReLU"]),
    (50, "Conv2d", ["BatchNorm", "ReLU", "MaxPool"]),
    (51, "Conv2d", ["BiasAdd", "SiLU"]),
    (52, "Conv2d", ["BiasAdd", "GELU", "AvgPool"]),
    (53, "Conv2d", ["InstanceNorm", "LeakyReLU"]),
    (54, "Conv2d", ["GroupNorm", "SiLU"]),
    (55, "Conv2d", ["BiasAdd", "Tanh", "GlobalAvgPool"]),
    (56, "Conv2d", ["BatchNorm", "HardSwish", "GlobalAvgPool"]),
    (57, "Conv2d", ["BiasAdd", "Mish", "MaxPool"]),
    (58, "Conv2d", ["BiasAdd", "ELU", "InstanceNorm"]),
    (59, "Conv2d", ["BiasAdd", "Sigmoid", "Scale"]),
    (60, "Conv2d", ["BiasAdd", "ReLU", "AvgPool", "GlobalAvgPool"]),
    (61, "Conv2d", ["BatchNorm", "LeakyReLU", "MaxPool", "GlobalAvgPool"]),
    (62, "Conv2d", ["GroupNorm", "GELU", "AvgPool"]),
    (63, "Conv2d", ["BiasAdd", "HardTanh", "MaxPool"]),
    (64, "Conv2d", ["BiasAdd", "Softplus", "InstanceNorm", "Scale"]),
    (65, "Conv2d", ["BiasAdd", "Clamp", "GlobalAvgPool", "Softmax"]),
    (66, "Conv2d", ["BatchNorm", "SiLU", "AvgPool", "GlobalAvgPool"]),
    (67, "Conv2d", ["BiasAdd", "Abs", "Max"]),
    (68, "Conv2d", ["InstanceNorm", "HardSwish", "MaxPool"]),
    (69, "Conv2d", ["BiasAdd", "GELU", "GroupNorm"]),
    (70, "Conv2d", ["BiasAdd", "ReLU", "Residual"]),
    (71, "DWConv2d", ["BiasAdd", "ReLU"]),
    (72, "DWConv2d", ["BatchNorm", "HardSwish"]),
    (73, "DWConv2d", ["BiasAdd", "ReLU", "MaxPool"]),
    (74, "DWConv2d", ["InstanceNorm", "SiLU", "Residual"]),
    (75, "DWConv2d", ["GroupNorm", "GELU", "GlobalAvgPool"]),
    (76, "DWConv2d", ["BiasAdd", "LeakyReLU", "AvgPool"]),
    (77, "ConvT2d", ["ReLU"]),
    (78, "ConvT2d", ["BiasAdd", "Sigmoid"]),
    (79, "ConvT2d", ["BatchNorm", "ReLU"]),
    (80, "ConvT2d", ["BiasAdd", "GELU", "MaxPool"]),
    (81, "ConvT2d", ["InstanceNorm", "LeakyReLU", "Scale"]),
    (82, "ConvT2d", ["BiasAdd", "Tanh", "GlobalAvgPool"]),
    (83, "ConvT2d", ["GroupNorm", "SiLU", "AvgPool"]),
    (84, "ConvT2d", ["BiasAdd", "HardSwish", "MaxPool", "GlobalAvgPool"]),
    (85, "Conv1d", ["BiasAdd", "ReLU"]),
    (86, "Conv1d", ["BiasAdd", "GELU", "Residual"]),
    (87, "Conv1d", ["BatchNorm", "SiLU"]),
    (88, "Conv1d", ["BiasAdd", "Tanh", "Mean"]),
    (89, "Conv1d", ["BiasAdd", "LeakyReLU", "Max"]),
    (90, "Conv1d", ["BiasAdd", "Softmax"]),
    (91, "Conv1d", ["BatchNorm", "Mish", "Sum"]),
    (92, "Conv1d", ["BiasAdd", "ELU", "GlobalAvgPool"]),
    (93, "Conv3d", ["BiasAdd", "ReLU"]),
    (94, "Conv3d", ["BatchNorm", "SiLU"]),
    (95, "Conv3d", ["BiasAdd", "GELU", "GlobalAvgPool"]),
    (96, "Conv3d", ["BiasAdd", "LeakyReLU", "Mean"]),
    (97, "Conv3d", ["BiasAdd", "Tanh", "Scale", "Residual"]),
    (98, "Gemm", ["BiasAdd", "ReLU", "RMSNorm", "Residual"]),
    (99, "Matmul3d", ["LayerNorm", "GELU", "Residual", "RMSNorm"]),
    (100, "BMM", ["LayerNorm", "SiLU", "Residual", "Softmax"]),
]


def emit(write):
    for pid, backbone, chain in L2_CHAINS:
        _emit_l2(write, pid, backbone, chain)
    from gen_problems_l3 import emit_l3

    emit_l3(write)
