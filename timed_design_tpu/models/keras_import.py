"""Keras `.h5` model importer: deserialize to a pure JAX function, no TF.

The reference distributes its whole model zoo as Keras `.h5` releases and
loads them with `tf.keras.models.load_model` (predict.py:121, README.md:100-
104). This module replaces that with an h5py-only importer: the stored
``model_config`` JSON graph is compiled into a topologically-ordered list of
JAX ops with the stored weights baked in — so DenseCPD/DenseNet architectures
are reconstructed from the h5 graph itself (no training code exists to
consult, SURVEY.md §7 risk list) and every release file runs on TPU via XLA.

Supported layer classes cover the zoo's graphs: InputLayer, Conv3D, Dense,
BatchNormalization, Activation, ELU/ReLU/LeakyReLU/Softmax, (Spatial)Dropout,
GlobalAveragePooling3D/GlobalMaxPooling3D, MaxPooling3D/AveragePooling3D,
Flatten, Reshape, Add/Concatenate/Average, ZeroPadding3D. The custom
``top_3_cat_acc`` metric the reference must register to deserialize
(predict.py:24-25,88) is irrelevant here — metrics are not part of the
forward graph.
"""
from __future__ import annotations

import dataclasses
import json
import typing as t
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np


def _to_tuple(v, n=3):
    if isinstance(v, (list, tuple)):
        return tuple(int(x) for x in v)
    return (int(v),) * n


def _activation_fn(name: str | None):
    table = {
        None: lambda x: x,
        "linear": lambda x: x,
        "relu": jax.nn.relu,
        "elu": jax.nn.elu,
        "softmax": lambda x: jax.nn.softmax(x, axis=-1),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "gelu": jax.nn.gelu,
        "softplus": jax.nn.softplus,
        "selu": jax.nn.selu,
        "swish": jax.nn.swish,
    }
    if name not in table:
        raise NotImplementedError(f"Activation {name!r} not supported")
    return table[name]


def _pool_padding(padding: str):
    return padding.upper()  # 'same' -> 'SAME'


@dataclasses.dataclass
class _Node:
    name: str
    fn: t.Callable  # (list of input arrays) -> array
    inputs: list[str]


class KerasH5Model:
    """An imported Keras model: callable pure function of one input array.

    ``model(x)`` runs the forward graph; ``jax.jit(model)`` compiles it.
    Weight arrays live in ``self.weights`` (a flat dict) so they can be
    sharded/donated like any pytree; the callable closes over them through
    an explicit parameter for jit-friendliness: use ``model.apply(weights, x)``
    for functional use, or ``model(x)`` for convenience.
    """

    def __init__(self, nodes: list[_Node], input_name: str, output_name: str,
                 weights: dict[str, dict[str, np.ndarray]], name: str = ""):
        self._nodes = nodes
        self._input = input_name
        self._output = output_name
        self.weights = weights
        self.name = name

    # -- public API ---------------------------------------------------------
    def apply(self, weights: dict, x):
        env: dict[str, t.Any] = {self._input: x}
        for node in self._nodes:
            if node.name in env:
                continue
            args = [env[i] for i in node.inputs]
            env[node.name] = node.fn(weights, args)
        return env[self._output]

    def __call__(self, x):
        return self.apply(self.weights, x)

    @property
    def n_classes(self) -> int:
        # output dim of the last weighted layer; resolved at first call site
        return self._n_classes

    # -- construction -------------------------------------------------------
    @staticmethod
    def load(path: Path, compute_dtype=jnp.float32) -> "KerasH5Model":
        path = Path(path)
        with h5py.File(path, "r") as f:
            config_raw = f.attrs.get("model_config")
            if config_raw is None:
                raise ValueError(f"{path} has no model_config attr (not a Keras h5?)")
            if isinstance(config_raw, bytes):
                config_raw = config_raw.decode()
            config = json.loads(config_raw)
            weights = _read_weights(f)
        return _build(config, weights, compute_dtype, name=path.stem)


def _read_weights(f: h5py.File) -> dict[str, dict[str, np.ndarray]]:
    out: dict[str, dict[str, np.ndarray]] = {}
    mw = f["model_weights"] if "model_weights" in f else f
    for layer_name in mw:
        grp = mw[layer_name]
        wn = grp.attrs.get("weight_names", [])
        layer_w: dict[str, np.ndarray] = {}
        for name in wn:
            name = name.decode() if isinstance(name, bytes) else str(name)
            short = name.split("/")[-1].split(":")[0]
            layer_w[short] = np.asarray(grp[name])
        if layer_w:
            out[layer_name] = layer_w
    return out


def _build(config: dict, weights: dict, compute_dtype, name="") -> KerasH5Model:
    cls = config.get("class_name")
    cfg = config.get("config", {})
    if cls == "Sequential":
        layer_cfgs = cfg["layers"]
        nodes: list[_Node] = []
        prev = "__input__"
        for lc in layer_cfgs:
            lname = lc["config"]["name"]
            if lc["class_name"] == "InputLayer":
                continue
            fn = _layer_fn(lc["class_name"], lc["config"], lname, compute_dtype)
            nodes.append(_Node(lname, fn, [prev]))
            prev = lname
        model = KerasH5Model(nodes, "__input__", prev, weights, name)
    elif cls in ("Functional", "Model"):
        input_name = _endpoint_name(cfg["input_layers"])
        output_name = _endpoint_name(cfg["output_layers"])
        nodes = []
        for lc in cfg["layers"]:
            lname = lc["config"]["name"]
            if lc["class_name"] == "InputLayer":
                continue
            inbound = lc.get("inbound_nodes", [])
            inputs = _parse_inbound(inbound)
            fn = _layer_fn(lc["class_name"], lc["config"], lname, compute_dtype)
            nodes.append(_Node(lname, fn, inputs))
        nodes = _toposort(nodes, input_name)
        model = KerasH5Model(nodes, input_name, output_name, weights, name)
    else:
        raise NotImplementedError(f"Model class {cls!r} not supported")
    model._n_classes = _infer_n_classes(config, weights)
    return model


def _infer_n_classes(config: dict, weights: dict) -> int:
    """Output class count from the last kernel-bearing layer in the config."""
    layers = config["config"]["layers"]
    for lc in reversed(layers):
        lname = lc["config"]["name"]
        if lname in weights and "kernel" in weights[lname]:
            return int(weights[lname]["kernel"].shape[-1])
    return 20


def _endpoint_name(spec) -> str:
    """First layer name from input_layers/output_layers, any nesting style:
    Keras 2 ``[["name", 0, 0]]`` / ``[[["name", 0, 0]]]``, Keras 3 legacy h5
    ``["name", 0, 0]``."""
    node = spec
    while isinstance(node, list) and node and isinstance(node[0], list):
        node = node[0]
    return node[0]


def _parse_inbound(inbound) -> list[str]:
    """Handle both legacy list-format and keras>=2.13 node formats."""
    if not inbound:
        return []
    node = inbound[0]
    names = []
    if isinstance(node, list):
        for item in node:
            if isinstance(item, list):
                names.append(item[0])
            elif isinstance(item, dict):  # keras-3 style args
                names.extend(_extract_history(item))
    elif isinstance(node, dict):
        names.extend(_extract_history(node))
    return names


def _extract_history(obj) -> list[str]:
    out = []
    if isinstance(obj, dict):
        if "keras_history" in obj:
            out.append(obj["keras_history"][0])
        else:
            for v in obj.values():
                out.extend(_extract_history(v))
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            out.extend(_extract_history(v))
    return out


def _toposort(nodes: list[_Node], input_name: str) -> list[_Node]:
    by_name = {n.name: n for n in nodes}
    done: set[str] = {input_name}
    ordered: list[_Node] = []

    def visit(n: _Node, stack: set[str]):
        if n.name in done:
            return
        if n.name in stack:
            raise ValueError(f"Cycle at layer {n.name}")
        stack.add(n.name)
        for i in n.inputs:
            if i in by_name:
                visit(by_name[i], stack)
        stack.discard(n.name)
        done.add(n.name)
        ordered.append(n)

    for n in nodes:
        visit(n, set())
    return ordered


def _layer_fn(class_name: str, cfg: dict, lname: str, dt) -> t.Callable:
    """Build (weights, [inputs]) -> output for one Keras layer."""
    act = _activation_fn(cfg.get("activation")) if "activation" in cfg else None

    if class_name in ("Conv3D", "Conv2D", "Conv1D"):
        ndim = int(class_name[4])
        strides = _to_tuple(cfg.get("strides", 1), ndim)
        dilation = _to_tuple(cfg.get("dilation_rate", 1), ndim)
        padding = cfg.get("padding", "valid").upper()
        use_bias = cfg.get("use_bias", True)
        dn = jax.lax.conv_dimension_numbers(
            (1,) * (ndim + 2), (1,) * (ndim + 2),
            ("N" + "DHW"[-ndim:] + "C", "DHW"[-ndim:] + "IO", "N" + "DHW"[-ndim:] + "C"),
        )

        def fn(weights, args, _s=strides, _d=dilation, _p=padding, _dn=dn,
               _ub=use_bias, _act=act, _n=lname):
            (x,) = args
            w = weights[_n]
            y = jax.lax.conv_general_dilated(
                x.astype(dt), jnp.asarray(w["kernel"], dt),
                window_strides=_s, padding=_p, rhs_dilation=_d,
                dimension_numbers=_dn, preferred_element_type=jnp.float32,
            )
            if _ub:
                y = y + jnp.asarray(w["bias"], jnp.float32)
            return _act(y)

        return fn

    if class_name == "Dense":
        use_bias = cfg.get("use_bias", True)

        def fn(weights, args, _ub=use_bias, _act=act, _n=lname):
            (x,) = args
            w = weights[_n]
            y = jnp.dot(x.astype(dt), jnp.asarray(w["kernel"], dt),
                        preferred_element_type=jnp.float32)
            if _ub:
                y = y + jnp.asarray(w["bias"], jnp.float32)
            return _act(y)

        return fn

    if class_name == "BatchNormalization":
        eps = float(cfg.get("epsilon", 1e-3))
        scale = cfg.get("scale", True)
        center = cfg.get("center", True)

        def fn(weights, args, _eps=eps, _n=lname, _scale=scale, _center=center):
            (x,) = args
            w = weights[_n]
            mean = jnp.asarray(w["moving_mean"], jnp.float32)
            var = jnp.asarray(w["moving_variance"], jnp.float32)
            inv = jax.lax.rsqrt(var + _eps)
            if _scale:
                inv = inv * jnp.asarray(w["gamma"], jnp.float32)
            y = (x.astype(jnp.float32) - mean) * inv
            if _center:
                y = y + jnp.asarray(w["beta"], jnp.float32)
            return y

        return fn

    if class_name == "Activation":
        return lambda weights, args, _act=act: _act(args[0])
    if class_name == "ELU":
        alpha = float(cfg.get("alpha", 1.0))
        return lambda weights, args, _a=alpha: jnp.where(
            args[0] > 0, args[0], _a * jnp.expm1(args[0])
        )
    if class_name == "ReLU":
        # Keras ReLU carries max_value / negative_slope / threshold
        max_value = cfg.get("max_value")
        neg = float(cfg.get("negative_slope") or 0.0)
        thr = float(cfg.get("threshold") or 0.0)

        def fn(weights, args, _mv=max_value, _ns=neg, _t=thr):
            x = args[0]
            y = jnp.where(x >= _t, x, _ns * (x - _t))
            if _mv is not None:
                y = jnp.minimum(y, jnp.asarray(_mv, y.dtype))
            return y

        return fn
    if class_name == "LeakyReLU":
        # Keras 3 renamed the slope key: 'negative_slope' (2.x: 'alpha') —
        # reading only 'alpha' silently fell back to 0.3 on every Keras-3
        # save (caught by tests/test_keras_import_fuzz.py, seed 1020)
        alpha = cfg.get("negative_slope", cfg.get("alpha", 0.3))
        return lambda weights, args, _a=float(alpha): jax.nn.leaky_relu(
            args[0], _a
        )
    if class_name == "Softmax":
        axis = cfg.get("axis", -1)
        axis = int(axis[0]) if isinstance(axis, (list, tuple)) else int(axis)
        return lambda weights, args, _ax=axis: jax.nn.softmax(
            args[0], axis=_ax
        )
    if class_name in ("Dropout", "SpatialDropout3D", "SpatialDropout2D",
                      "SpatialDropout1D", "GaussianNoise", "AlphaDropout"):
        return lambda weights, args: args[0]  # inference: identity
    if class_name in ("GlobalAveragePooling3D", "GlobalAveragePooling2D"):
        ndim = 3 if "3D" in class_name else 2
        axes = tuple(range(1, 1 + ndim))
        return lambda weights, args, _ax=axes: args[0].mean(axis=_ax)
    if class_name in ("GlobalMaxPooling3D", "GlobalMaxPooling2D"):
        ndim = 3 if "3D" in class_name else 2
        axes = tuple(range(1, 1 + ndim))
        return lambda weights, args, _ax=axes: args[0].max(axis=_ax)
    if class_name in ("MaxPooling3D", "AveragePooling3D", "MaxPooling2D",
                      "AveragePooling2D"):
        ndim = 3 if "3D" in class_name else 2
        pool = _to_tuple(cfg.get("pool_size", 2), ndim)
        strides = _to_tuple(cfg.get("strides") or cfg.get("pool_size", 2), ndim)
        padding = _pool_padding(cfg.get("padding", "valid"))
        is_max = class_name.startswith("Max")

        def fn(weights, args, _p=pool, _s=strides, _pad=padding, _max=is_max):
            (x,) = args
            window = (1, *_p, 1)
            stride = (1, *_s, 1)
            if _max:
                return jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, window, stride, _pad
                )
            summed = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, window, stride, _pad
            )
            if _pad == "VALID":
                return summed / np.prod(_p)
            ones = jnp.ones_like(x)
            counts = jax.lax.reduce_window(
                ones, 0.0, jax.lax.add, window, stride, _pad
            )
            return summed / counts

        return fn
    if class_name == "Flatten":
        return lambda weights, args: args[0].reshape(args[0].shape[0], -1)
    if class_name == "Reshape":
        target = tuple(cfg["target_shape"])
        return lambda weights, args, _t=target: args[0].reshape(
            (args[0].shape[0], *_t)
        )
    if class_name == "Add":
        return lambda weights, args: sum(args)
    if class_name == "Average":
        return lambda weights, args: sum(args) / len(args)
    if class_name == "Concatenate":
        axis = int(cfg.get("axis", -1))
        return lambda weights, args, _ax=axis: jnp.concatenate(args, axis=_ax)
    if class_name == "ZeroPadding3D":
        pad = cfg.get("padding", 1)
        if isinstance(pad, int):
            pads = [(pad, pad)] * 3
        else:
            pads = [tuple(p) if isinstance(p, (list, tuple)) else (p, p) for p in pad]
        return lambda weights, args, _p=pads: jnp.pad(
            args[0], ((0, 0), *_p, (0, 0))
        )
    if class_name == "Cropping3D":
        crop = cfg.get("cropping", 1)
        if isinstance(crop, int):
            crops = [(crop, crop)] * 3
        else:
            crops = [tuple(c) if isinstance(c, (list, tuple)) else (c, c) for c in crop]

        def fn(weights, args, _c=crops):
            x = args[0]
            sl = tuple(
                slice(c0, x.shape[d + 1] - c1 if c1 else None)
                for d, (c0, c1) in enumerate(_c)
            )
            return x[(slice(None), *sl, slice(None))]

        return fn
    if class_name == "UpSampling3D":
        size = _to_tuple(cfg.get("size", 2), 3)

        def fn(weights, args, _s=size):
            x = args[0]
            for d, rep in enumerate(_s):
                x = jnp.repeat(x, rep, axis=d + 1)
            return x

        return fn
    if class_name == "PReLU":
        def fn(weights, args, _n=lname):
            alpha = jnp.asarray(weights[_n]["alpha"], jnp.float32)
            x = args[0]
            return jnp.where(x >= 0, x, alpha * x)

        return fn
    if class_name == "Multiply":
        def fn(weights, args):
            out = args[0]
            for a in args[1:]:
                out = out * a
            return out

        return fn
    raise NotImplementedError(f"Keras layer {class_name!r} not supported")


def load_keras_model(path: Path, compute_dtype=jnp.float32) -> KerasH5Model:
    """Load a Keras `.h5` release file as a jittable JAX callable."""
    return KerasH5Model.load(path, compute_dtype=compute_dtype)


_TIMED_PASSTHROUGH_LAYERS = {
    "InputLayer", "ELU", "Activation", "SpatialDropout3D", "Dropout",
    "GlobalAveragePooling3D", "Softmax",
}


def import_timed_params(path: Path) -> dict:
    """Keras `.h5` -> Flax TIMED ``{"params", "batch_stats"}`` tree.

    The inverse of keras_export.export_timed_to_h5, for FINE-TUNING released
    weights with td-train (a workflow the reference cannot do at all — it
    ships fixed `.h5` releases, README.md:100-104, and has no training
    code). Accepts any linear Conv3D/ELU/BatchNorm chain ending in a
    projection Conv3D — the TIMED family shape (README.md:254) in either
    the Keras-3 or legacy Keras-2 weight layout. Branching graphs
    (DenseNet/ProDCoNN releases) raise a ValueError naming the offending
    layer; those still load for inference via `load_keras_model`.
    """
    path = Path(path)
    with h5py.File(path, "r") as f:
        config_raw = f.attrs.get("model_config")
        if config_raw is None:
            raise ValueError(f"{path} has no model_config attr (not a Keras h5?)")
        if isinstance(config_raw, bytes):
            config_raw = config_raw.decode()
        config = json.loads(config_raw)
        weights = _read_weights(f)

    convs: list[str] = []
    bns: list[str] = []
    for lc in config["config"]["layers"]:
        cn = lc["class_name"]
        name = lc["config"]["name"]
        if cn == "Conv3D":
            convs.append(name)
        elif cn == "BatchNormalization":
            bns.append(name)
        elif cn not in _TIMED_PASSTHROUGH_LAYERS:
            raise ValueError(
                f"layer {name!r} ({cn}) is not part of a linear TIMED "
                f"conv/BN chain — this h5 cannot map onto the Flax TIMED "
                f"parameter tree (use load_keras_model for inference)"
            )
    if len(convs) != len(bns) + 1:
        raise ValueError(
            f"expected one projection conv after {len(bns)} conv/BN blocks, "
            f"found {len(convs)} Conv3D layers — not a TIMED-shaped chain"
        )

    def conv_params(lname: str) -> dict:
        w = weights.get(lname, {})
        if "kernel" not in w or "bias" not in w:
            raise ValueError(
                f"conv layer {lname!r} is missing kernel/bias weights "
                f"(found {sorted(w)}) — use_bias=False convs cannot map "
                f"onto the Flax TIMED tree"
            )
        return {"kernel": jnp.asarray(w["kernel"], jnp.float32),
                "bias": jnp.asarray(w["bias"], jnp.float32)}

    params: dict = {}
    batch_stats: dict = {}
    for i, (cname, bname) in enumerate(zip(convs, bns)):
        bw = weights.get(bname, {})
        missing = {"gamma", "beta", "moving_mean", "moving_variance"} - set(bw)
        if missing:
            raise ValueError(f"BN layer {bname!r} is missing {sorted(missing)}")
        params[f"ConvBlock_{i}"] = {
            "Conv_0": conv_params(cname),
            "BatchNorm_0": {
                "scale": jnp.asarray(bw["gamma"], jnp.float32),
                "bias": jnp.asarray(bw["beta"], jnp.float32),
            },
        }
        batch_stats[f"ConvBlock_{i}"] = {
            "BatchNorm_0": {
                "mean": jnp.asarray(bw["moving_mean"], jnp.float32),
                "var": jnp.asarray(bw["moving_variance"], jnp.float32),
            }
        }
    params["Conv_0"] = conv_params(convs[-1])
    return {"params": params, "batch_stats": batch_stats}
