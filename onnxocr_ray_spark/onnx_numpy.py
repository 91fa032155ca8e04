"""Minimal pure-numpy ONNX graph evaluator (no onnx / onnxruntime).

The reference ships exactly three runnable model blobs — the angle
classifiers (`onnxocr/models/{ch_ppocr_server_v2.0,ppocrv4,ppocrv5}/cls/
cls.onnx`, ~570 KB PP-LCNet graphs; det/rec blobs are stripped, see
`.MISSING_LARGE_BLOBS`). onnxruntime cannot be installed in this
container, so this module makes those real weights executable anyway:

- a varint-level protobuf reader for the subset of onnx.proto that the
  cls graphs use (ModelProto / GraphProto / NodeProto / AttributeProto /
  TensorProto) — no ``onnx`` package;
- a deterministic numpy evaluator for the 18-op set the three graphs
  contain (Conv incl. depthwise groups, BatchNormalization, Relu, Clip,
  HardSigmoid, Add/Mul/Div, GlobalAveragePool, MaxPool, Shape, Cast,
  Slice, Concat, Reshape, MatMul, Softmax, Constant) — opset 11
  semantics;
- a session facade with the ``onnxruntime.InferenceSession`` surface that
  ``models.get_session`` needs (``get_inputs()[0].name`` / ``run``), so
  ``OrtClassifier`` runs the REAL cls weights through the existing
  batched loop (`models.py`) with zero changes to the stage wiring.

This is a correctness/golden-pinning path, not a throughput path: a real
deployment swaps in onnxruntime via the same ``get_session`` contract
(models.py:37) and nothing else changes. Everything here is float32
numpy, bit-deterministic across runs and hosts using the same BLAS-free
einsum paths.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

# --- protobuf wire reader --------------------------------------------------


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _signed(v: int) -> int:
    """proto int64 varints carry negatives as 64-bit two's complement."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf: memoryview) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) triples of one message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = bytes(buf[i : i + 8])
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = bytes(buf[i : i + 4])
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_varints(v, wt) -> List[int]:
    """A repeated varint field arrives packed (wt 2) or one-per-tag (wt 0)."""
    if wt == 0:
        return [v]
    out = []
    i = 0
    while i < len(v):
        x, i = _varint(v, i)
        out.append(x)
    return out


# onnx TensorProto.DataType -> numpy
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
}


def _tensor(buf: memoryview) -> np.ndarray:
    """TensorProto -> ndarray (dims=1, data_type=2, raw_data=9 or the
    typed repeated fields 4/5/7/10)."""
    dims: List[int] = []
    dtype = 1
    raw: Optional[bytes] = None
    typed: Optional[np.ndarray] = None
    for fno, wt, v in _fields(buf):
        if fno == 1:
            dims.extend(_signed(x) for x in _packed_varints(v, wt))
        elif fno == 2:
            dtype = v
        elif fno == 9:
            raw = bytes(v)
        elif fno == 4:  # float_data (packed fixed32)
            typed = np.frombuffer(bytes(v), dtype=np.float32).copy()
        elif fno == 5:  # int32_data
            typed = np.array(
                [_signed(x) for x in _packed_varints(v, wt)], dtype=np.int32
            )
        elif fno == 7:  # int64_data
            typed = np.array(
                [_signed(x) for x in _packed_varints(v, wt)], dtype=np.int64
            )
        elif fno == 10:  # double_data
            typed = np.frombuffer(bytes(v), dtype=np.float64).copy()
    np_dt = _DTYPES[dtype]
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dt).copy()
    elif typed is not None:
        arr = typed.astype(np_dt, copy=False)
    else:  # zero-element tensor
        arr = np.zeros(0, dtype=np_dt)
    return arr.reshape(dims) if dims else arr.reshape(())


class _Node:
    __slots__ = ("op", "inputs", "outputs", "attrs")

    def __init__(self, op, inputs, outputs, attrs):
        self.op = op
        self.inputs = inputs
        self.outputs = outputs
        self.attrs = attrs


def _attr(buf: memoryview):
    """AttributeProto -> (name, python value)."""
    name = None
    val = None
    for fno, wt, v in _fields(buf):
        if fno == 1:
            name = bytes(v).decode()
        elif fno == 2:  # f (fixed32)
            val = struct.unpack("<f", v)[0]
        elif fno == 3:  # i
            val = _signed(v)
        elif fno == 4:  # s
            val = bytes(v)
        elif fno == 5:  # t
            val = _tensor(v)
        elif fno == 7:  # floats
            if wt == 5:
                val = (val or []) + [struct.unpack("<f", v)[0]]
            else:
                val = np.frombuffer(bytes(v), dtype=np.float32).tolist()
        elif fno == 8:  # ints
            cur = val if isinstance(val, list) else []
            val = cur + [_signed(x) for x in _packed_varints(v, wt)]
    return name, val


def _parse_graph(buf: memoryview):
    nodes: List[_Node] = []
    tensors: Dict[str, np.ndarray] = {}
    inputs: List[str] = []
    outputs: List[str] = []
    for fno, wt, v in _fields(buf):
        if fno == 1:  # node
            ins, outs, op, attrs = [], [], None, {}
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    ins.append(bytes(v2).decode())
                elif f2 == 2:
                    outs.append(bytes(v2).decode())
                elif f2 == 4:
                    op = bytes(v2).decode()
                elif f2 == 5:
                    k, val = _attr(v2)
                    attrs[k] = val
            nodes.append(_Node(op, ins, outs, attrs))
        elif fno == 5:  # initializer
            t = _tensor(v)
            for f2, w2, v2 in _fields(v):
                if f2 == 8:
                    tensors[bytes(v2).decode()] = t
        elif fno == 11:  # graph input
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    inputs.append(bytes(v2).decode())
        elif fno == 12:  # graph output
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    outputs.append(bytes(v2).decode())
    return nodes, tensors, inputs, outputs


def parse_model(data: bytes):
    """ModelProto bytes -> (nodes, constant tensors, input names, output
    names). Only the graph (field 7) is interpreted."""
    graph = None
    for fno, wt, v in _fields(memoryview(data)):
        if fno == 7:
            graph = v
    if graph is None:
        raise ValueError("no GraphProto in model")
    return _parse_graph(graph)


# --- numpy op kernels ------------------------------------------------------


def _pool_view(Xp: np.ndarray, kh: int, kw: int, sh: int, sw: int,
               dh: int = 1, dw: int = 1) -> np.ndarray:
    """(N,C,Hp,Wp) -> strided window view (N,C,kh,kw,Ho,Wo), zero-copy."""
    N, C, H, W = Xp.shape
    Ho = (H - (dh * (kh - 1) + 1)) // sh + 1
    Wo = (W - (dw * (kw - 1) + 1)) // sw + 1
    sn, sc, sH, sW = Xp.strides
    return np.lib.stride_tricks.as_strided(
        Xp,
        (N, C, kh, kw, Ho, Wo),
        (sn, sc, sH * dh, sW * dw, sH * sh, sW * sw),
    )


def _conv(X, W, B, attrs):
    group = attrs.get("group", 1)
    kh, kw = attrs.get("kernel_shape", W.shape[2:])
    sh, sw = attrs.get("strides", [1, 1])
    dh, dw = attrs.get("dilations", [1, 1])
    pt, pl, pb, pr = attrs.get("pads", [0, 0, 0, 0])
    Xp = np.pad(X, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    view = _pool_view(Xp, kh, kw, sh, sw, dh, dw)
    N, C = X.shape[:2]
    M = W.shape[0]
    if group == 1:
        out = np.einsum("nckluv,mckl->nmuv", view, W, optimize=True)
    elif group == C and W.shape[1] == 1 and M == C:
        # depthwise: one filter per channel, no cross-channel sum
        out = np.einsum("nckluv,ckl->ncuv", view, W[:, 0], optimize=True)
    else:
        cg, mg = C // group, M // group
        parts = [
            np.einsum(
                "nckluv,mckl->nmuv",
                view[:, g * cg : (g + 1) * cg],
                W[g * mg : (g + 1) * mg],
                optimize=True,
            )
            for g in range(group)
        ]
        out = np.concatenate(parts, axis=1)
    out = out.astype(np.float32, copy=False)
    if B is not None:
        out = out + B.reshape(1, -1, 1, 1)
    return out


def _maxpool(X, attrs):
    kh, kw = attrs["kernel_shape"]
    sh, sw = attrs.get("strides", [1, 1])
    pt, pl, pb, pr = attrs.get("pads", [0, 0, 0, 0])
    if attrs.get("ceil_mode", 0):
        # pad the tail so the ceil-mode windows exist, then floor-divide
        H, W = X.shape[2:]
        need_h = max(0, -(-(H + pt + pb - kh) // sh) * sh + kh - (H + pt + pb))
        need_w = max(0, -(-(W + pl + pr - kw) // sw) * sw + kw - (W + pl + pr))
        pb, pr = pb + need_h, pr + need_w
    Xp = np.pad(
        X, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
        constant_values=np.float32(-np.inf),
    )
    return _pool_view(Xp, kh, kw, sh, sw).max(axis=(2, 3))


def _slice_op(data, starts, ends, axes=None, steps=None):
    axes = range(data.ndim) if axes is None else [int(a) for a in axes]
    steps = [1] * len(starts) if steps is None else [int(s) for s in steps]
    sl = [slice(None)] * data.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        sl[ax] = slice(int(st), int(en), sp)
    return data[tuple(sl)]


def _reshape(data, shape):
    shape = [int(s) for s in shape]
    out = [
        data.shape[i] if s == 0 else s for i, s in enumerate(shape)
    ]  # allowzero=0 semantics
    return data.reshape(out)


def _softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


class NumpyOnnxSession:
    """``onnxruntime.InferenceSession`` facade over the numpy evaluator —
    exactly the surface models.get_session consumers use:
    ``get_inputs()[0].name`` and ``run(None, {name: batch})[0]``."""

    class _IO:
        def __init__(self, name):
            self.name = name

    def __init__(self, model_path: str):
        with open(model_path, "rb") as fh:
            data = fh.read()
        self.nodes, self.consts, self._inputs, self._outputs = parse_model(data)
        # graph "inputs" include nothing but the real input here (no
        # initializer-style inputs in the paddle2onnx cls graphs)
        self._feed_names = [
            n for n in self._inputs if n not in self.consts
        ]

    def get_inputs(self):
        return [self._IO(n) for n in self._feed_names]

    def get_outputs(self):
        return [self._IO(n) for n in self._outputs]

    def run(self, output_names, feeds: Dict[str, np.ndarray]):
        env: Dict[str, np.ndarray] = dict(self.consts)
        for k, v in feeds.items():
            env[k] = np.asarray(v, dtype=np.float32)
        for nd in self.nodes:
            self._exec(nd, env)
        names = output_names or self._outputs
        return [env[n] for n in names]

    def _exec(self, nd: _Node, env: Dict[str, np.ndarray]) -> None:
        op = nd.op
        ins = [env[i] if i else None for i in nd.inputs]
        a = nd.attrs
        if op == "Constant":
            out = a["value"]
        elif op == "Conv":
            out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif op == "BatchNormalization":
            x, scale, b, mean, var = ins[:5]
            eps = np.float32(a.get("epsilon", 1e-5))
            shape = (1, -1, 1, 1) if x.ndim == 4 else (1, -1)
            out = (
                (x - mean.reshape(shape))
                / np.sqrt(var.reshape(shape) + eps)
                * scale.reshape(shape)
                + b.reshape(shape)
            ).astype(np.float32, copy=False)
        elif op == "Relu":
            out = np.maximum(ins[0], np.float32(0))
        elif op == "Clip":  # opset 11: min/max as optional inputs
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
            out = np.clip(ins[0], lo, hi).astype(np.float32, copy=False)
        elif op == "HardSigmoid":
            alpha = np.float32(a.get("alpha", 0.2))
            beta = np.float32(a.get("beta", 0.5))
            out = np.clip(alpha * ins[0] + beta, 0.0, 1.0).astype(
                np.float32, copy=False
            )
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "GlobalAveragePool":
            out = ins[0].mean(axis=(2, 3), keepdims=True).astype(
                np.float32, copy=False
            )
        elif op == "MaxPool":
            out = _maxpool(ins[0], a)
        elif op == "Shape":
            out = np.array(ins[0].shape, dtype=np.int64)
        elif op == "Cast":
            out = ins[0].astype(_DTYPES[a["to"]])
        elif op == "Slice":
            out = _slice_op(
                ins[0],
                ins[1],
                ins[2],
                ins[3] if len(ins) > 3 else None,
                ins[4] if len(ins) > 4 else None,
            )
        elif op == "Concat":
            out = np.concatenate(ins, axis=a["axis"])
        elif op == "Reshape":
            out = _reshape(ins[0], ins[1])
        elif op == "MatMul":
            out = np.matmul(ins[0], ins[1])
        elif op == "Flatten":
            ax = a.get("axis", 1)
            out = ins[0].reshape(int(np.prod(ins[0].shape[:ax])), -1)
        elif op == "Gemm":
            alpha = np.float32(a.get("alpha", 1.0))
            beta = np.float32(a.get("beta", 1.0))
            x = ins[0].T if a.get("transA") else ins[0]
            w = ins[1].T if a.get("transB") else ins[1]
            out = alpha * np.matmul(x, w)
            if len(ins) > 2 and ins[2] is not None:
                out = out + beta * ins[2]
        elif op == "Sigmoid":
            out = (1.0 / (1.0 + np.exp(-ins[0]))).astype(np.float32, copy=False)
        elif op == "Softmax":
            out = _softmax(ins[0], a.get("axis", 1)).astype(
                np.float32, copy=False
            )
        else:
            raise NotImplementedError(
                f"op {op!r} not in the numpy evaluator's op set; extend "
                "onnx_numpy.NumpyOnnxSession._exec or use onnxruntime"
            )
        env[nd.outputs[0]] = out
        # multi-output ops in the supported set: BatchNormalization's
        # training outputs are never consumed by inference graphs
        for extra in nd.outputs[1:]:
            if extra:
                env[extra] = out
