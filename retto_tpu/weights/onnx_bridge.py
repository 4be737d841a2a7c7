"""ONNX graph -> jittable JAX function.

TPU-native replacement for the reference's ONNX Runtime sessions
(ort_worker.rs:120-135, 188-221): instead of delegating to a C++ inference
engine, the ONNX graph is translated op-by-op into a pure JAX function and
compiled by XLA — so the reference's actual PP-OCRv4 ``.onnx`` artifacts
run on TPU through the same ``det/cls/rec`` engine contract.

Static-shape discipline: shape-computation subgraphs (Shape -> Gather ->
Concat -> Reshape chains that Paddle exports emit) are constant-folded on
the host — values whose every ancestor is an initializer or a static shape
stay NumPy, so XLA sees only static shapes.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import RettoWeightsError
from .onnx_proto import OnnxModel, parse_model, tensor_to_numpy

__all__ = ["OnnxFunction", "load_onnx", "build_fn"]


def _static(v: Any) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def _np(v: Any) -> np.ndarray:
    if _static(v):
        return np.asarray(v)
    raise RettoWeightsError(
        "onnx bridge: a dynamic tensor feeds a shape-like input; this graph "
        "needs data-dependent shapes, which XLA does not support"
    )


def _ints(v: Any) -> list[int]:
    return [int(x) for x in np.atleast_1d(_np(v))]


_DT = {
    1: jnp.float32, 6: jnp.int32, 7: jnp.int64, 9: jnp.bool_,
    10: jnp.float16, 11: jnp.float64, 2: jnp.uint8, 3: jnp.int8,
}


def _pool_padding(attrs, spatial: int):
    pads = attrs.get("pads", [0] * 2 * spatial)
    return [(pads[i], pads[i + spatial]) for i in range(spatial)]


class _Ops:
    """Op registry: each handler takes (attrs, *inputs) -> output(s)."""

    registry: dict[str, Callable] = {}

    @classmethod
    def register(cls, *names):
        def deco(fn):
            for n in names:
                cls.registry[n] = fn
            return fn

        return deco


op = _Ops.register


# ----------------------------- elementwise ---------------------------- #
@op("Add")
def _add(a, x, y):
    return x + y


@op("Sub")
def _sub(a, x, y):
    return x - y


@op("Mul")
def _mul(a, x, y):
    return x * y


@op("Div")
def _div(a, x, y):
    # ONNX Div on integer tensors is C-style integer division (truncation
    # toward zero).  torch exports chunk/split sizing as constant-folded
    # Shape -> Add -> Div -> Mul chains feeding Slice bounds; true division
    # here yields fractional bounds that corrupt the slices downstream.
    def _dt(v):
        return np.asarray(v).dtype if _static(v) else v.dtype

    if np.issubdtype(_dt(x), np.integer) and np.issubdtype(_dt(y), np.integer):
        lib = np if (_static(x) and _static(y)) else jnp
        q = lib.abs(x) // lib.abs(y)
        return lib.where((x < 0) != (y < 0), -q, q)
    return x / y


@op("Pow")
def _pow(a, x, y):
    return x**y


@op("Neg")
def _neg(a, x):
    return -x


@op("Sqrt")
def _sqrt(a, x):
    return jnp.sqrt(x)


@op("Exp")
def _exp(a, x):
    return jnp.exp(x)


@op("Log")
def _log(a, x):
    return jnp.log(x)


@op("Erf")
def _erf(a, x):
    return jax.scipy.special.erf(x)


@op("Tanh")
def _tanh(a, x):
    return jnp.tanh(x)


@op("Relu")
def _relu(a, x):
    return jnp.maximum(x, 0)


@op("LeakyRelu")
def _leaky(a, x):
    return jnp.where(x >= 0, x, x * a.get("alpha", 0.01))


@op("Sigmoid")
def _sigmoid(a, x):
    return jax.nn.sigmoid(x)


@op("HardSigmoid")
def _hardsigmoid(a, x):
    return jnp.clip(x * a.get("alpha", 0.2) + a.get("beta", 0.5), 0.0, 1.0)


@op("HardSwish")
def _hardswish(a, x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


@op("Clip")
def _clip(a, x, lo=None, hi=None):
    lo = a.get("min", lo)
    hi = a.get("max", hi)
    if lo is not None:
        x = jnp.maximum(x, jnp.asarray(lo, x.dtype) if _static(lo) else lo)
    if hi is not None:
        x = jnp.minimum(x, jnp.asarray(hi, x.dtype) if _static(hi) else hi)
    return x


@op("Where")
def _where(a, c, x, y):
    return jnp.where(c, x, y)


@op("Equal")
def _equal(a, x, y):
    return x == y


@op("Greater")
def _greater(a, x, y):
    return x > y


@op("Less")
def _less(a, x, y):
    return x < y


@op("Not")
def _not(a, x):
    return jnp.logical_not(x)


@op("Abs")
def _abs(a, x):
    return jnp.abs(x)


@op("Floor")
def _floor(a, x):
    return np.floor(x) if _static(x) else jnp.floor(x)


@op("Ceil")
def _ceil(a, x):
    return np.ceil(x) if _static(x) else jnp.ceil(x)


@op("Round")
def _round(a, x):
    return np.rint(x) if _static(x) else jnp.rint(x)


@op("Min")
def _min(a, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = np.minimum(out, x) if _static(out) and _static(x) else jnp.minimum(out, x)
    return out


@op("Max")
def _max(a, *xs):
    out = xs[0]
    for x in xs[1:]:
        out = np.maximum(out, x) if _static(out) and _static(x) else jnp.maximum(out, x)
    return out


@op("Tile")
def _tile(a, x, reps):
    return jnp.tile(x, _ints(reps))


@op("Softmax")
def _softmax(a, x):
    return jax.nn.softmax(x, axis=a.get("axis", -1))


@op("Identity", "Dropout")
def _identity(a, x, *rest):
    return x


@op("Cast")
def _cast(a, x):
    to = _DT.get(a["to"], jnp.float32)
    if _static(x):
        return np.asarray(x).astype(to)
    return x.astype(to)


# ------------------------------ structure ----------------------------- #
@op("Shape")
def _shape(a, x):
    return np.asarray(x.shape, np.int64)


@op("Constant")
def _constant(a):
    if "value" in a:
        return tensor_to_numpy(a["value"])
    for k in ("value_float", "value_int"):
        if k in a:
            return np.asarray(a[k])
    if "value_floats" in a:
        return np.asarray(a["value_floats"], np.float32)
    if "value_ints" in a:
        return np.asarray(a["value_ints"], np.int64)
    raise RettoWeightsError("Constant node without value")


@op("ConstantOfShape")
def _constant_of_shape(a, shape):
    fill = tensor_to_numpy(a["value"]).reshape(-1)[0] if "value" in a else np.float32(0)
    return np.full(_ints(shape), fill)


@op("Reshape")
def _reshape(a, x, shape):
    tgt = _ints(shape)
    xs = list(x.shape)
    # onnx: 0 copies the input dim (unless allowzero), -1 infers
    out = [
        xs[i] if (d == 0 and not a.get("allowzero", 0)) else d
        for i, d in enumerate(tgt)
    ]
    if -1 in out:
        fixed = int(np.prod([d for d in out if d != -1]))
        out[out.index(-1)] = int(np.prod(xs)) // max(fixed, 1)
    return np.reshape(x, out) if _static(x) else jnp.reshape(x, out)


@op("Transpose")
def _transpose(a, x):
    perm = a.get("perm")
    if _static(x):
        return np.transpose(x, perm)
    return jnp.transpose(x, perm)


@op("Concat")
def _concat(a, *xs):
    axis = a["axis"]
    if all(_static(x) for x in xs):
        return np.concatenate([np.atleast_1d(_np(x)) for x in xs], axis=axis)
    return jnp.concatenate(xs, axis=axis)


@op("Split")
def _split(a, x, split=None):
    axis = a.get("axis", 0)
    sizes = a.get("split") or (None if split is None else _ints(split))
    if sizes is None:
        num = a.get("num_outputs")
        sizes = [x.shape[axis] // num] * num
    idxs = np.cumsum(sizes)[:-1]
    return tuple(jnp.split(x, idxs, axis=axis))


@op("Slice")
def _slice(a, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:  # opset < 10: attributes
        starts, ends = a["starts"], a["ends"]
        axes = a.get("axes")
        steps = None
    starts, ends = _ints(starts), _ints(ends)
    axes = list(range(len(starts))) if axes is None else _ints(axes)
    steps = [1] * len(starts) if steps is None else _ints(steps)
    sl = [slice(None)] * x.ndim
    for s, e, ax, st in zip(starts, ends, axes, steps):
        sl[ax] = slice(s, None if e >= np.iinfo(np.int32).max else e, st)
    return x[tuple(sl)]


@op("Squeeze")
def _squeeze(a, x, axes=None):
    ax = a.get("axes") or (None if axes is None else _ints(axes))
    mod = np if _static(x) else jnp
    if ax is None:
        return mod.squeeze(x)
    return mod.squeeze(x, axis=tuple(int(i) for i in ax))


@op("Unsqueeze")
def _unsqueeze(a, x, axes=None):
    ax = a.get("axes") or _ints(axes)
    mod = np if _static(x) else jnp
    for i in sorted(int(v) for v in ax):
        x = mod.expand_dims(x, i)
    return x


@op("Gather")
def _gather(a, x, idx):
    axis = a.get("axis", 0)
    if _static(x) and _static(idx):
        return np.take(np.asarray(x), np.asarray(idx).astype(np.int64), axis=axis)
    return jnp.take(x, jnp.asarray(idx), axis=axis)


@op("Expand")
def _expand(a, x, shape):
    tgt = _ints(shape)
    # onnx Expand uses numpy broadcasting vs target
    out_shape = np.broadcast_shapes(tuple(x.shape), tuple(tgt))
    mod = np if _static(x) else jnp
    return mod.broadcast_to(x, out_shape)


@op("Range")
def _range(a, start, limit, delta):
    return np.arange(int(_np(start)), int(_np(limit)), int(_np(delta)))


@op("Flatten")
def _flatten(a, x):
    axis = a.get("axis", 1)
    lead = int(np.prod(x.shape[:axis])) if axis else 1
    return jnp.reshape(x, (lead, -1))


@op("Pad")
def _pad(a, x, pads=None, value=None):
    mode = a.get("mode", "constant")
    p = a.get("pads") or _ints(pads)
    n = x.ndim
    cfg = [(p[i], p[i + n]) for i in range(n)]
    cv = float(_np(value)) if value is not None else 0.0
    if mode == "constant":
        return jnp.pad(x, cfg, constant_values=cv)
    return jnp.pad(x, cfg, mode={"reflect": "reflect", "edge": "edge"}[mode])


# ----------------------------- reductions ----------------------------- #
def _reduce(fn, a, x, axes_in=None):
    ax = a.get("axes") or (None if axes_in is None else _ints(axes_in))
    keep = bool(a.get("keepdims", 1))
    ax_t = None if ax is None else tuple(int(i) for i in ax)
    return fn(x, axis=ax_t, keepdims=keep)


@op("ReduceMean")
def _reduce_mean(a, x, axes=None):
    return _reduce(jnp.mean, a, x, axes)


@op("ReduceSum")
def _reduce_sum(a, x, axes=None):
    return _reduce(jnp.sum, a, x, axes)


@op("ReduceMax")
def _reduce_max(a, x, axes=None):
    return _reduce(jnp.max, a, x, axes)


@op("ReduceMin")
def _reduce_min(a, x, axes=None):
    return _reduce(jnp.min, a, x, axes)


@op("ArgMax")
def _argmax(a, x):
    axis = a.get("axis", 0)
    r = jnp.argmax(x, axis=axis)
    if a.get("keepdims", 1):
        r = jnp.expand_dims(r, axis)
    return r


# ------------------------------- linear ------------------------------- #
@op("MatMul")
def _matmul(a, x, y):
    return jnp.matmul(x, y)


@op("Gemm")
def _gemm(a, x, w, b=None):
    alpha, beta = a.get("alpha", 1.0), a.get("beta", 1.0)
    if a.get("transA"):
        x = x.T
    if a.get("transB"):
        w = w.T
    out = alpha * (x @ w)
    if b is not None:
        out = out + beta * b
    return out


@op("LayerNormalization")
def _layernorm(a, x, scale, bias=None):
    axis = a.get("axis", -1)
    eps = a.get("epsilon", 1e-5)
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    out = (x - mean) / jnp.sqrt(var + eps) * scale
    if bias is not None:
        out = out + bias
    return out


# ----------------------------- conv / pool ---------------------------- #
@op("Conv")
def _conv(a, x, w, b=None):
    spatial = x.ndim - 2
    strides = a.get("strides", [1] * spatial)
    dil = a.get("dilations", [1] * spatial)
    group = a.get("group", 1)
    auto = a.get("auto_pad", "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        pad = "SAME"
    elif auto == "VALID":
        pad = "VALID"
    else:
        pads = a.get("pads", [0] * 2 * spatial)
        pad = [(pads[i], pads[i + spatial]) for i in range(spatial)]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NCHW", "OIHW", "NCHW") if spatial == 2 else None
    )
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w),
        window_strides=strides, padding=pad, rhs_dilation=dil,
        dimension_numbers=dn, feature_group_count=group,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * spatial)
    return out


@op("ConvTranspose")
def _conv_transpose(a, x, w, b=None):
    spatial = x.ndim - 2
    strides = a.get("strides", [1] * spatial)
    pads = a.get("pads", [0] * 2 * spatial)
    group = a.get("group", 1)
    if group != 1:
        raise RettoWeightsError("grouped ConvTranspose not supported")
    # onnx W is [C_in, C_out, kh, kw]; flip + swap to OIHW for a dilated conv
    w = jnp.asarray(w)
    k = w.shape[2:]
    w_t = jnp.flip(w, axis=tuple(range(2, 2 + spatial))).swapaxes(0, 1)
    pad = [
        (k[i] - 1 - pads[i], k[i] - 1 - pads[i + spatial]) for i in range(spatial)
    ]
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w_t.shape, ("NCHW", "OIHW", "NCHW") if spatial == 2 else None
    )
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), w_t, window_strides=[1] * spatial, padding=pad,
        lhs_dilation=strides, dimension_numbers=dn,
    )
    if b is not None:
        out = out + jnp.asarray(b).reshape((1, -1) + (1,) * spatial)
    return out


@op("BatchNormalization")
def _batchnorm(a, x, scale, b, mean, var):
    eps = a.get("epsilon", 1e-5)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    mean, var, scale, b = (jnp.asarray(v) for v in (mean, var, scale, b))
    return (x - mean.reshape(shape)) * (
        scale.reshape(shape) / jnp.sqrt(var + eps).reshape(shape)
    ) + b.reshape(shape)


@op("MaxPool")
def _maxpool(a, x):
    k = a["kernel_shape"]
    s = a.get("strides", [1] * len(k))
    pad = _pool_padding(a, len(k))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1, *k), (1, 1, *s), [(0, 0), (0, 0), *pad],
    )


@op("AveragePool")
def _avgpool(a, x):
    k = a["kernel_shape"]
    s = a.get("strides", [1] * len(k))
    pad = _pool_padding(a, len(k))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, *k), (1, 1, *s), [(0, 0), (0, 0), *pad]
    )
    if a.get("count_include_pad", 0):
        return summed / math.prod(k)
    ones = jnp.ones(x.shape[2:], x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, tuple(k), tuple(s), pad
    )
    return summed / counts


@op("GlobalAveragePool")
def _gap(a, x):
    return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)


@op("Resize")
def _resize(a, x, roi=None, scales=None, sizes=None):
    mode = a.get("mode", "nearest")
    if sizes is not None and np.size(_np(sizes)):
        out_shape = _ints(sizes)
    else:
        sc = np.atleast_1d(_np(scales)).astype(np.float64)
        out_shape = [int(math.floor(d * s)) for d, s in zip(x.shape, sc)]
    method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
    return jax.image.resize(x, out_shape, method=method)


# ---------------------------------------------------------------------- #


# Structural ops that may be constant-folded on host during tracing.
_FOLDABLE = {
    "Shape", "Gather", "Slice", "Concat", "Unsqueeze", "Squeeze", "Cast",
    "Constant", "ConstantOfShape", "Range", "Add", "Sub", "Mul", "Div",
    "Reshape", "Transpose", "Expand", "Identity",
}
# Arg positions that MUST be concrete (shape-like); when the producing
# subgraph folded statically, the np value is routed here even though the
# same tensor also exists as a tracer in params.
_STATIC_ARGS: dict[str, set[int]] = {
    "Reshape": {1}, "Slice": {1, 2, 3, 4}, "Resize": {1, 2, 3},
    "Expand": {1}, "Unsqueeze": {1}, "Squeeze": {1},
    "ConstantOfShape": {0}, "Range": {0, 1, 2}, "Split": {1},
    "Pad": {1, 2}, "ReduceMean": {1}, "ReduceSum": {1}, "ReduceMax": {1},
    "ReduceMin": {1}, "Tile": {1},
}


class OnnxFunction:
    """A parsed ONNX graph, callable as fn(params, *inputs).

    Two-level evaluation: a host-side static pass folds shape-computation
    subgraphs (all-static structural nodes) with NumPy, and the traced pass
    consumes those np values at shape-like arg positions — so Paddle's
    Shape->Gather->Concat->Reshape chains stay static under jit while the
    heavy tensors remain traced jit arguments (uploaded once, never baked
    into the executable)."""

    def __init__(self, model: OnnxModel):
        self.model = model
        g = model.graph
        self.params: dict[str, np.ndarray] = {
            name: tensor_to_numpy(t) for name, t in g.initializers.items()
        }
        self.input_names = [
            vi.name for vi in g.inputs if vi.name not in self.params
        ]
        self.output_names = [vi.name for vi in g.outputs]

    def __call__(self, params: dict[str, np.ndarray], *inputs):
        env: dict[str, Any] = dict(params)
        senv: dict[str, Any] = dict(self.params)
        for name, val in zip(self.input_names, inputs):
            env[name] = val
            if _static(val):
                senv[name] = np.asarray(val)
        for node in self.model.graph.nodes:
            fn = _Ops.registry.get(node.op_type)
            if fn is None:
                raise RettoWeightsError(
                    f"onnx bridge: unsupported op {node.op_type!r} "
                    f"(node {node.name!r})"
                )
            # input names may refer to tracer values whose static twin lives
            # in senv; Shape works on tracers too (shapes are static)
            if node.op_type in _FOLDABLE and all(
                (not i) or (i in senv) or (node.op_type == "Shape" and i in env)
                for i in node.inputs
            ):
                try:
                    sargs = [
                        (senv.get(i, env.get(i)) if i else None)
                        for i in node.inputs
                    ]
                    sout = fn(node.attrs, *sargs)
                    souts = sout if isinstance(sout, tuple) else (sout,)
                    if all(_static(v) for v in souts):
                        for name, val in zip(node.outputs, souts):
                            senv[name] = val
                            env[name] = val
                        continue
                except Exception:  # noqa: BLE001 - fall through to traced
                    pass
            static_pos = _STATIC_ARGS.get(node.op_type, set())
            args = []
            for k, name in enumerate(node.inputs):
                if not name:
                    args.append(None)
                elif k in static_pos and name in senv:
                    args.append(senv[name])
                else:
                    args.append(env[name])
            out = fn(node.attrs, *args)
            outs = out if isinstance(out, tuple) else (out,)
            for name, val in zip(node.outputs, outs):
                env[name] = val
        result = tuple(env[n] for n in self.output_names)
        return result if len(result) > 1 else result[0]


def build_fn(data: bytes) -> tuple[OnnxFunction, dict[str, np.ndarray]]:
    """Parse serialized ONNX -> (callable, params).  Jit as
    ``jax.jit(fn)(params, x)``; params stay a pytree argument so they are
    uploaded once, not baked into the executable."""
    fn = OnnxFunction(parse_model(data))
    return fn, fn.params


def load_onnx(path) -> tuple[OnnxFunction, dict[str, np.ndarray]]:
    from pathlib import Path

    return build_fn(Path(path).read_bytes())
