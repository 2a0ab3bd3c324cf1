"""Torch-checkpoint interop: import/export reference ``.pth.tar`` files.

A user of the reference has trained checkpoints saved by
``fumi/utils/utils.py:406-419`` — a torch pickle of
``{batch_idx, state_dict, best_loss, optimizer, args}`` — and switching
frameworks must not mean retraining. This module maps that format to and
from this framework's param pytrees:

- **state_dict ↔ params**: every reference module attribute name
  (``image_encoder``, ``g.0``, ``net.lin_final``, ``hyper_net.2``,
  ``text_encoder.rnn.weight_ih_l0``, ...) has a fixed slot in our pytrees;
  linear weights are stored (out, in) on both sides (models/layers.py), so
  the mapping is pure renaming — no transposes.
- **optimizer state**: torch Adam/AdamW ``exp_avg``/``exp_avg_sq``/``step``
  land in optax ``ScaleByAdamState.mu/nu/count`` and torch SGD
  ``momentum_buffer`` in ``TraceState.trace``, so training *continues*
  rather than restarting its moments. Params torch never built state for
  (frozen text encoders — torch skips grad-less params) keep zero moments,
  matching what torch would do on resume.

Wired into :func:`fumi_tpu.train.checkpoint.load_checkpoint`: a
``--checkpoint`` value that is a torch *file* (vs an orbax run dir) routes
here, so the CLI, serving, and ``/v1/reload`` all accept reference
checkpoints directly. The reverse direction
(:func:`export_torch_checkpoint`, CLI ``fumi_tpu.cli.export_torch``)
writes a reference-shaped file that ``load_checkpoint`` in the reference
(``utils.py:422-441``) restores — including a synthesized
``optimizer`` state dict torch's ``Optimizer.load_state_dict`` accepts.

Reference key inventory (state_dict names), per family:

- maml  (``PureImageNetwork``, ref maml.py:15-33): ``net.lin_0`` ..
  ``net.lin_{i}``, ``net.lin_final``.
- am3   (ref am3.py:16-88): ``image_encoder``, ``text_encoder.*``,
  ``g.0``/``g.3``, ``h.0``/``h.3`` (Sequential Linear-ReLU-Dropout-Linear).
- fumi  (ref fumi.py:18-110): ``text_encoder.*``, ``im_net.linear{i}``,
  ``hyper_net.0``/``hyper_net.2`` (head; ReLU at 1, optional Tanh at 3).
- clip  (ref clip.py:11-25): ``text_fc``, ``text_fc2``, ``image_fc``,
  ``image_fc2``.
- text encoders (ref common.py:8-161): Identity (BERT/precomputed, no
  params); ``text_encoder.embed.weight`` (WordEmbedding);
  ``text_encoder.embed.weight`` + ``text_encoder.rnn.{weight,bias}_{ih,hh}_l0[_reverse]``
  (RNN/RnnHid, gate order i,f,g,o on both sides); ``text_encoder.weight``/
  ``.bias`` (the ``rand`` encoder's never-used Linear, ref am3.py:68-69).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

FAMILIES = ("maml", "am3", "fumi", "clip")


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (host)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# Name trees: pytrees with OUR structure whose leaves are REFERENCE
# state_dict key strings. One tree drives import (fetch by name), export
# (zip with params), and optimizer-moment placement (name -> leaf slot).
# ---------------------------------------------------------------------------

def _lin_names(prefix: str) -> Dict[str, str]:
    return {"w": prefix + ".weight", "b": prefix + ".bias"}


def _text_encoder_names(sd: Optional[Mapping] = None,
                        params: Optional[Mapping] = None):
    """Name tree for the text-encoder subtree (ref common.py:8-161)."""
    if sd is not None:
        keys = {k for k in sd if k.startswith("text_encoder.")}
        if not keys:
            return {}
        if "text_encoder.weight" in keys:  # the rand encoder's Linear
            return _lin_names("text_encoder")
        has_rnn = any(".rnn." in k for k in keys)
    else:
        if params is None or len(params) == 0:
            return {}
        if set(params) == {"w", "b"}:
            return _lin_names("text_encoder")
        has_rnn = "w_ih" in params
    names: Dict[str, str] = {"embed": "text_encoder.embed.weight"}
    if has_rnn:
        for ours, theirs in (("w_ih", "weight_ih_l0"),
                             ("w_hh", "weight_hh_l0"),
                             ("b_ih", "bias_ih_l0"),
                             ("b_hh", "bias_hh_l0")):
            names[ours] = f"text_encoder.rnn.{theirs}"
            names[ours + "_rev"] = f"text_encoder.rnn.{theirs}_reverse"
    return names


def _check_linear(params, what: str):
    if not (isinstance(params, Mapping) and set(params) == {"w", "b"}):
        raise ValueError(
            f"{what} is not a plain linear layer — raw-image encoders "
            "(conv4/resnet12) are extensions of this framework with no "
            "reference checkpoint format")


def _name_tree(family: str, sd: Optional[Mapping] = None,
               params: Optional[Any] = None):
    """Structure-matched tree of reference key names for ``family``.

    Structure is discovered from ``sd`` (import) or ``params`` (export).
    """
    if family == "maml":
        if sd is not None:
            n_hidden = 0
            while f"net.lin_{n_hidden}.weight" in sd:
                n_hidden += 1
        else:
            n_hidden = len(params) - 1
        return tuple([_lin_names(f"net.lin_{i}") for i in range(n_hidden)]
                     + [_lin_names("net.lin_final")])
    if family == "am3":
        if params is not None:
            _check_linear(params["image_encoder"], "am3 image_encoder")
        te = _text_encoder_names(
            sd, None if params is None else params["text_encoder"])
        return {
            "image_encoder": _lin_names("image_encoder"),
            "text_encoder": te,
            "g": (_lin_names("g.0"), _lin_names("g.3")),
            "h": (_lin_names("h.0"), _lin_names("h.3")),
        }
    if family == "fumi":
        if sd is not None:
            n_im = 0
            while f"im_net.linear{n_im}.weight" in sd:
                n_im += 1
        else:
            im_net = params["im_net"]
            if not isinstance(im_net, (tuple, list)):
                raise ValueError(
                    "fumi im_net is not a linear stack — raw-image "
                    "backbones have no reference checkpoint format")
            n_im = len(im_net)
        te = _text_encoder_names(
            sd, None if params is None else params["text_encoder"])
        return {
            "text_encoder": te,
            "hyper_net": (_lin_names("hyper_net.0"),
                          _lin_names("hyper_net.2")),
            "im_net": tuple(_lin_names(f"im_net.linear{i}")
                            for i in range(n_im)),
        }
    if family == "clip":
        return {k: _lin_names(k)
                for k in ("text_fc", "text_fc2", "image_fc", "image_fc2")}
    raise ValueError(f"no torch interop for model family {family!r} "
                     f"(supported: {FAMILIES})")


def _ordered_names(family: str, names) -> List[str]:
    """Reference key names in torch REGISTRATION order (= state_dict order
    = ``model.parameters()`` order, which assigns optimizer param ids).

    Registration order per family: am3 registers image_encoder,
    text_encoder, g, h (ref am3.py:41-88); FUMI registers text_encoder,
    im_net, hyper_net (ref fumi.py:47-110 — the hypernet layers are built
    first but ``self.hyper_net`` is *assigned* last); torch nn.LSTM
    registers weight_ih, weight_hh, bias_ih, bias_hh then the reverse
    direction.
    """
    out: List[str] = []

    def lin(d):
        out.extend([d["w"], d["b"]])

    def text(te):
        if not te:
            return
        if set(te) == {"w", "b"}:
            lin(te)
            return
        out.append(te["embed"])
        if "w_ih" in te:
            for sfx in ("", "_rev"):
                for k in ("w_ih", "w_hh", "b_ih", "b_hh"):
                    out.append(te[k + sfx])

    if family == "maml":
        for d in names:
            lin(d)
    elif family == "am3":
        lin(names["image_encoder"])
        text(names["text_encoder"])
        for sect in ("g", "h"):
            lin(names[sect][0])
            lin(names[sect][1])
    elif family == "fumi":
        text(names["text_encoder"])
        for d in names["im_net"]:
            lin(d)
        lin(names["hyper_net"][0])
        lin(names["hyper_net"][1])
    elif family == "clip":
        for k in ("text_fc", "text_fc2", "image_fc", "image_fc2"):
            lin(names[k])
    return out


def detect_family(state_dict: Mapping) -> str:
    """Infer the model family from reference state_dict key names."""
    keys = set(state_dict)
    if any(k.startswith("net.lin_") for k in keys):
        return "maml"
    if any(k.startswith("hyper_net.") for k in keys):
        return "fumi"
    if any(k.startswith("g.") for k in keys):
        return "am3"
    if "text_fc.weight" in keys:
        return "clip"
    raise ValueError(
        "cannot infer a model family from this torch checkpoint "
        f"(keys: {sorted(keys)[:8]}...) — it does not look like a "
        "reference fumi checkpoint")


# ---------------------------------------------------------------------------
# state_dict <-> params
# ---------------------------------------------------------------------------

def torch_to_params(state_dict: Mapping, family: str):
    """Reference state_dict -> our params pytree (float32 numpy leaves)."""
    import jax
    names = _name_tree(family, sd=state_dict)
    try:
        return jax.tree.map(lambda n: _np(state_dict[n]), names)
    except KeyError as e:
        raise ValueError(
            f"torch checkpoint is missing key {e} expected for a "
            f"{family!r} model — wrong --model for this checkpoint?"
        ) from e


def params_to_torch(params, family: str) -> "OrderedDict[str, np.ndarray]":
    """Our params pytree -> reference-named state_dict (registration
    order, so torch ``load_state_dict(strict=True)`` and optimizer param
    ids both line up)."""
    import jax
    names = _name_tree(family, params=params)
    if jax.tree.structure(names) != jax.tree.structure(params):
        raise ValueError(
            f"params tree does not have the reference {family!r} "
            "structure — extensions (raw-image encoders, registered "
            "families) have no reference checkpoint format")
    by_name = {n: _np(p) for n, p in zip(jax.tree.leaves(names),
                                         jax.tree.leaves(params))}
    return OrderedDict((n, by_name[n])
                       for n in _ordered_names(family, names))


# ---------------------------------------------------------------------------
# torch optimizer state -> optax
# ---------------------------------------------------------------------------

def _torch_opt_moments(torch_opt: Optional[Mapping],
                       key_order: List[str]):
    """Extract name-keyed Adam moments / SGD momentum buffers.

    torch assigns optimizer param ids in ``model.parameters()`` order,
    which equals state_dict key order for these models (every entry is a
    Parameter; there are no buffers — no BatchNorm anywhere in the
    reference). ``key_order`` is the checkpoint's own state_dict ordering.
    """
    mom1: Dict[str, np.ndarray] = {}
    mom2: Dict[str, np.ndarray] = {}
    trace: Dict[str, np.ndarray] = {}
    steps: List[int] = []
    if not torch_opt:
        return mom1, mom2, trace, 0
    state = torch_opt.get("state") or {}
    for pid, st in state.items():
        pid = int(pid)
        if pid >= len(key_order):
            continue
        name = key_order[pid]
        if "exp_avg" in st:
            mom1[name] = _np(st["exp_avg"])
            mom2[name] = _np(st["exp_avg_sq"])
            if st.get("step") is not None:
                steps.append(int(st["step"]))
        buf = st.get("momentum_buffer")
        if buf is not None:
            trace[name] = _np(buf)
    return mom1, mom2, trace, max(steps, default=0)


def inject_torch_opt_state(opt_state, torch_opt: Optional[Mapping],
                           state_dict: Mapping, family: str, params):
    """Place torch Adam/SGD moments into an optax opt_state.

    Walks the (arbitrarily chained/wrapped) optax state and fills every
    ``ScaleByAdamState`` with ``exp_avg``/``exp_avg_sq``/``step`` and every
    ``TraceState`` with ``momentum_buffer``. Params without torch state
    (frozen encoders) keep zero moments. No-op when the torch checkpoint
    carries no optimizer state.
    """
    import jax
    import jax.numpy as jnp
    import optax

    key_order = list(state_dict.keys())
    names = _name_tree(family, sd=state_dict)
    mom1, mom2, trace, count = _torch_opt_moments(torch_opt, key_order)
    if not mom1 and not trace:
        return opt_state

    def fill(table):
        return jax.tree.map(
            lambda n, p: jnp.asarray(table[n]) if n in table
            else jnp.zeros_like(p), names, params)

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState) and mom1:
            return s._replace(
                count=jnp.asarray(count, jnp.asarray(s.count).dtype),
                mu=fill(mom1), nu=fill(mom2))
        if isinstance(s, optax.TraceState) and trace:
            return s._replace(trace=fill(trace))
        if isinstance(s, tuple) and hasattr(s, "_fields"):  # NamedTuple
            return type(s)(*[walk(c) for c in s])
        if isinstance(s, (tuple, list)):
            return type(s)(walk(c) for c in s)
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        return s

    return walk(opt_state)


def _reset_ema(opt_state, params):
    """Point any EmaState at the (imported) params themselves."""
    from fumi_tpu.train.optim import EmaState

    def walk(s):
        if isinstance(s, EmaState):
            return EmaState(ema=params)
        if isinstance(s, tuple) and hasattr(s, "_fields"):
            return type(s)(*[walk(c) for c in s])
        if isinstance(s, (tuple, list)):
            return type(s)(walk(c) for c in s)
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        return s

    return walk(opt_state)


# ---------------------------------------------------------------------------
# Checkpoint file import / export
# ---------------------------------------------------------------------------

def _leaf_shapes_match(a, b) -> Optional[str]:
    import jax
    if jax.tree.structure(a) != jax.tree.structure(b):
        return (f"pytree structure mismatch: checkpoint "
                f"{jax.tree.structure(a)} vs model {jax.tree.structure(b)}")
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        if np.shape(la) != np.shape(lb):
            return (f"shape mismatch: checkpoint {np.shape(la)} vs model "
                    f"{np.shape(lb)}")
    return None


def load_torch_checkpoint(path: str, params_like=None, opt_state_like=None,
                          family: Optional[str] = None
                          ) -> Tuple[Any, Any, Dict]:
    """Load a reference ``.pth.tar`` → ``(params, opt_state, meta)``.

    Accepts the reference's full checkpoint dict
    (``{batch_idx, state_dict, best_loss, optimizer, args}``,
    ref utils.py:406-419) or a bare ``state_dict``. When
    ``params_like``/``opt_state_like`` are given, the result is validated
    against (and moments injected into) those structures — the same
    contract as :func:`fumi_tpu.train.checkpoint.load_checkpoint`.
    """
    import torch
    try:
        try:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
        except TypeError:  # older torch without weights_only
            ckpt = torch.load(path, map_location="cpu")
    except Exception as e:
        # corrupt / non-pickle file: a CLIENT/input error, not a server
        # defect — ValueError is the error class checkpoint consumers
        # (serving's /v1/reload, the CLI) map to "bad request"
        raise ValueError(
            f"{path} is not a loadable torch checkpoint: "
            f"{type(e).__name__}: {e}") from e
    if isinstance(ckpt, Mapping) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        meta = {"batch_idx": ckpt.get("batch_idx"),
                "best_loss": ckpt.get("best_loss"),
                "args": ckpt.get("args")}
        torch_opt = ckpt.get("optimizer")
    else:
        sd, meta, torch_opt = ckpt, {}, None
    saved_args = meta.get("args") or {}
    family = family or saved_args.get("model") or detect_family(sd)

    params = torch_to_params(sd, family)
    if params_like is not None:
        err = _leaf_shapes_match(params, params_like)
        if err:
            hints = {k: saved_args[k] for k in
                     ("model", "im_hid_dim", "prototype_dim", "text_encoder",
                      "text_emb_dim", "text_hid_dim", "im_emb_dim")
                     if k in saved_args}
            raise ValueError(
                f"torch checkpoint {path} does not fit the current model "
                f"config: {err}."
                + (f" The checkpoint was trained with {hints}." if hints
                   else ""))
    opt_state = opt_state_like
    if opt_state is not None:
        opt_state = inject_torch_opt_state(opt_state, torch_opt, sd,
                                           family, params)
        # --tpu_ema runs read eval/serving weights from EmaState (train/
        # loop.py:eval_view); opt_state_like was initialized from the
        # PRE-import params, so without this reset a torch import would
        # silently keep serving the old weights
        opt_state = _reset_ema(opt_state, params)
    bl = meta.get("best_loss")
    print(f"Imported torch checkpoint {path} ({family}), trained to batch "
          f"{meta.get('batch_idx')} with best loss {bl}")
    return params, opt_state, meta


def _extract_adam_moments(opt_state, params):
    """Find the params-shaped Adam/momentum state inside an optax state."""
    import jax
    import optax
    target = jax.tree.structure(params)
    found = {"mu": None, "nu": None, "count": 0, "trace": None}

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            if jax.tree.structure(s.mu) == target:
                found["mu"], found["nu"] = s.mu, s.nu
                found["count"] = int(np.asarray(s.count))
        elif isinstance(s, optax.TraceState):
            if jax.tree.structure(s.trace) == target:
                found["trace"] = s.trace
        elif isinstance(s, tuple):  # incl. NamedTuples
            for c in s:
                walk(c)
        elif isinstance(s, (list,)):
            for c in s:
                walk(c)
        elif isinstance(s, dict):
            for c in s.values():
                walk(c)

    if opt_state is not None:
        walk(opt_state)
    return found


def export_torch_checkpoint(path: str, params, family: str,
                            opt_state=None, args: Optional[dict] = None,
                            batch_idx: int = 0,
                            best_loss: float = float("inf"),
                            lr: float = 1e-3,
                            weight_decay: float = 5e-4,
                            momentum: float = 0.9,
                            optim: str = "adam") -> None:
    """Write a reference-shaped ``.pth.tar`` the reference can restore.

    The ``optimizer`` entry is synthesized so the reference's
    ``load_checkpoint`` (utils.py:434) — which calls torch
    ``Optimizer.load_state_dict`` — succeeds: one param group covering all
    params (the reference passes ``model.parameters()`` whole,
    utils.py:281) with per-param Adam moments/SGD buffers pulled from the
    optax state when available.
    """
    import jax
    import torch

    sd_np = params_to_torch(params, family)
    # copy=True: jax->numpy views are read-only, which torch warns about
    sd = OrderedDict((k, torch.from_numpy(np.array(v, dtype=np.float32)))
                     for k, v in sd_np.items())

    moments = _extract_adam_moments(opt_state, params)
    names = _name_tree(family, params=params)
    name_leaves = jax.tree.leaves(names)
    ordered = _ordered_names(family, names)
    pos = {n: i for i, n in enumerate(ordered)}

    # torch Optimizer.load_state_dict REPLACES each param group dict with
    # the saved one (keeping only 'params'), so the hyperparameter keys
    # must match the optimizer class the reference will construct
    # (init_optim, ref utils.py:277-299): torch.optim.Adam / torch.optim.
    # SGD / transformers AdamW (whose groups carry 'correct_bias').
    group: Dict[str, Any] = {"params": list(range(len(ordered))),
                             "lr": lr, "weight_decay": weight_decay}
    if optim == "SGD":
        group.update(momentum=momentum, dampening=0, nesterov=False,
                     maximize=False, foreach=None, differentiable=False)
    elif optim in ("adamw", "adamw_lin_schedule"):
        # union of the legacy transformers-AdamW keys ('correct_bias' —
        # the class the reference's pinned transformers 4.x constructs)
        # and modern torch.optim.AdamW keys: each consumer reads only its
        # own keys, and load_state_dict would KeyError on step() if the
        # replaced group lacked one it needs
        group.update(betas=(0.9, 0.999), eps=1e-6, correct_bias=True,
                     weight_decay=0.0, amsgrad=False, maximize=False,
                     foreach=None, capturable=False, differentiable=False,
                     fused=None)
    else:
        group.update(betas=(0.9, 0.999), eps=1e-8,
                     amsgrad=False, maximize=False, foreach=None,
                     capturable=False, differentiable=False, fused=None)
    state: Dict[int, Dict[str, Any]] = {}
    if moments["mu"] is not None:
        mu_by_name = dict(zip(name_leaves, jax.tree.leaves(moments["mu"])))
        nu_by_name = dict(zip(name_leaves, jax.tree.leaves(moments["nu"])))
        for n in ordered:
            state[pos[n]] = {
                "step": torch.tensor(float(moments["count"])),
                # torch.tensor copies: from_numpy on a jax-backed view would
                # alias non-writable memory (and warn)
                "exp_avg": torch.tensor(_np(mu_by_name[n])),
                "exp_avg_sq": torch.tensor(_np(nu_by_name[n])),
            }
    elif moments["trace"] is not None:
        tr_by_name = dict(zip(name_leaves, jax.tree.leaves(moments["trace"])))
        for n in ordered:
            state[pos[n]] = {
                "momentum_buffer": torch.tensor(_np(tr_by_name[n]))}

    ckpt = {
        "batch_idx": int(batch_idx),
        "state_dict": sd,
        "best_loss": float(best_loss),
        "optimizer": {"state": state, "param_groups": [group]},
        "args": dict(args or {}),
    }
    torch.save(ckpt, path)
