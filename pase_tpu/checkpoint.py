"""Checkpointing: native format, rolling Saver, and torch interop.

* Native format: a single ``.npz`` holding the flattened variable tree
  (params + batch_stats + optimizer state) plus a JSON sidecar-free
  ``__meta__`` entry with the step. Self-contained, mmap-friendly.
* ``Saver`` mirrors the reference's JSON ``checkpoints`` index with rolling
  ``max_ckpts`` retention (/root/reference/pase/models/modules.py:151-301).
* ``torch_to_variables`` converts reference PyTorch state dicts (e.g. the
  published ``FE_e199.ckpt`` encoder artifact) to our variable trees,
  replicating ``load_pretrained_ckpt``'s key/shape filtering
  (modules.py:267-301).
"""

import io
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict


# ---------------------------------------------------------------------------
# native save / load
# ---------------------------------------------------------------------------

def _flat(tree) -> Dict[str, np.ndarray]:
    flat = flatten_dict(unfreeze(tree) if hasattr(tree, "unfreeze") or
                        isinstance(tree, dict) else tree, sep="/")
    # None leaves (e.g. disabled GAN state in a full TrainState dict) are
    # structure, not data — the restore path re-derives them from the
    # freshly initialized template
    return {k: np.asarray(v) for k, v in flat.items() if v is not None}


def save_variables(path: str, variables, step: int = 0, extra: Optional[dict] = None):
    flat = _flat(variables)
    meta = {"step": int(step)}
    if extra:
        meta.update(extra)
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8).copy()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    return path


def load_variables(path: str):
    data = np.load(path, allow_pickle=False)
    meta = {}
    tree = {}
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k].tobytes()).decode("utf-8"))
        else:
            tree[k] = jnp.asarray(data[k])
    return freeze(unflatten_dict(tree, sep="/")), meta


def train_state_to_tree(state) -> dict:
    """Full TrainState (NamedTuple incl. optimizer / policy / rng / GAN
    state) -> plain nested dict ready for save_variables. Mirrors the
    reference Saver persisting optimizer state alongside the weights
    (/root/reference/pase/models/modules.py:151-301)."""
    from flax import serialization
    return serialization.to_state_dict(jax.device_get(state))


def restore_train_state(template, tree):
    """Restore a TrainState from a loaded checkpoint tree.

    ``template`` is a freshly initialized (host-side) TrainState providing
    the pytree structure: every non-None array leaf of the template must
    be present in ``tree`` (strict — a partial optimizer state would
    silently perturb optimization, the exact failure mode this exists to
    prevent). None leaves / empty collections are taken from the template.
    """
    from flax import serialization
    from flax.traverse_util import empty_node

    t_sd = serialization.to_state_dict(template)
    flat_t = flatten_dict(t_sd, keep_empty_nodes=True)
    flat_l = flatten_dict(unfreeze(tree))
    missing = []
    for k, v in list(flat_t.items()):
        if v is None or v is empty_node:
            continue
        if k in flat_l:
            flat_t[k] = jnp.asarray(flat_l[k])
        else:
            missing.append("/".join(map(str, k)))
    if missing:
        raise ValueError(
            "checkpoint is missing TrainState leaves (refusing a partial "
            f"resume): {missing[:8]}{'...' if len(missing) > 8 else ''}")
    return serialization.from_state_dict(template,
                                         unflatten_dict(flat_t))


class Saver:
    """Rolling checkpoint manager with a JSON index, mirroring the reference
    Saver semantics (latest list, current pointer, max_ckpts deletion)."""

    def __init__(self, save_path: str, max_ckpts: int = 5, prefix: str = ""):
        self.save_path = save_path
        self.max_ckpts = max_ckpts
        self.prefix = prefix
        self.index_path = os.path.join(save_path, f"{prefix}checkpoints")

    def _read_index(self):
        if os.path.exists(self.index_path):
            with open(self.index_path, "r") as f:
                return json.load(f)
        return {"latest": [], "current": None}

    def save(self, name: str, variables, step: int, extra: Optional[dict] = None):
        os.makedirs(self.save_path, exist_ok=True)
        ckpts = self._read_index()
        model_path = f"{self.prefix}{name}-{step}.npz"
        # crash-safety ordering: write the NEW weights first, then the
        # index pointing at them, and only then evict the oldest — a kill
        # between index write and weights write would otherwise leave
        # 'current' dangling and the evictee already deleted
        save_variables(os.path.join(self.save_path, "weights_" + model_path),
                       variables, step, extra)
        latest = ckpts["latest"]
        todel = None
        if self.max_ckpts is not None and len(latest) >= self.max_ckpts:
            todel = latest[0]
            latest = latest[1:]
        latest.append(model_path)
        ckpts["latest"] = latest
        ckpts["current"] = model_path
        with open(self.index_path, "w") as f:
            f.write(json.dumps(ckpts, indent=2))
        if todel is not None:
            try:
                os.remove(os.path.join(self.save_path, "weights_" + todel))
            except FileNotFoundError:
                pass
        return model_path

    def read_latest_checkpoint(self) -> Optional[str]:
        ckpts = self._read_index()
        return ckpts.get("current")

    def load_weights(self):
        cur = self.read_latest_checkpoint()
        if cur is None:
            return None, None
        return load_variables(os.path.join(self.save_path, "weights_" + cur))


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------

def _load_torch_state_dict(path):
    import torch
    st = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(st, dict) and "state_dict" in st:
        st = st["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in st.items()}


def _map_torch_key(tkey: str):
    """Map one torch WaveFe state-dict key to (collection, path tuple,
    transform tag). Returns None for keys we drop (num_batches_tracked)."""
    parts = tkey.split(".")
    if parts[-1] == "num_batches_tracked":
        return None
    # module path: 'blocks.0' -> 'blocks_0'; 'denseskips.3' -> 'denseskips_3'
    # 'rnn.layers.0.linear' -> ('rnn', 'layers_0_linear')
    path = []
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if i + 1 < len(parts) - 1 and parts[i + 1].isdigit():
            if p == "layers" and i + 2 < len(parts) and parts[i + 2] == "linear":
                path.append(f"layers_{parts[i+1]}_linear")
                i += 3
                continue
            path.append(f"{p}_{parts[i+1]}")
            i += 2
        else:
            path.append(p)
            i += 1
    leaf = parts[-1]
    import re as _re
    m = _re.match(r"^(weight|bias)_(ih|hh)_l(\d+)(_reverse)?$", leaf)
    if m:
        # torch nn.LSTM/GRU flat params -> BiRNN (nn.py), which keeps
        # torch's [G*H, in] layout and gate order: exact copy
        kind, side, lnum, rev = m.groups()
        pname = (f"l{lnum}_{'bw' if rev else 'fw'}_"
                 f"{'w' if kind == 'weight' else 'b'}_{side}")
        return ("params", tuple(path) + (pname,), "id")
    if leaf == "weight_g":      # torch weight_norm -> WNConv1D.g
        return ("params", tuple(path) + ("g",), "squeeze")
    if leaf == "weight_v":      # torch weight_norm -> WNConv1D.v
        return ("params", tuple(path) + ("v",), "conv_kernel")
    if leaf == "weight_u":      # torch spectral_norm power-iteration state
        return ("batch_stats", tuple(path) + ("u",), "id")
    if leaf == "weight_orig":   # torch spectral_norm -> SNConv1D.kernel
        return ("params", tuple(path) + ("kernel",), "conv_kernel")
    if leaf == "low_hz_":
        return ("params", tuple(path) + ("low_hz",), "id")
    if leaf == "band_hz_":
        return ("params", tuple(path) + ("band_hz",), "id")
    if leaf == "running_mean":
        return ("batch_stats", tuple(path) + ("mean",), "id")
    if leaf == "running_var":
        return ("batch_stats", tuple(path) + ("var",), "id")
    if leaf == "weight":
        return ("params", tuple(path), "weight")
    if leaf == "bias":
        return ("params", tuple(path) + ("bias",), "id")
    return ("params", tuple(path) + (leaf,), "id")


def torch_to_variables(state_dict: Dict[str, np.ndarray], ref_variables,
                       load_last: bool = True, verbose: bool = False,
                       strict: bool = True):
    """Convert a torch state dict into our variable tree, filling entries
    that exist in ``ref_variables`` with matching shapes (the reference's
    key/shape-intersection loading, modules.py:283-296). strict raises on
    any skipped key (matching the reference's refusal of partial loads,
    modules.py:290-291); strict=False restores silent filtering for
    deliberately partial transfers."""
    ref = unfreeze(ref_variables)
    flat_ref = flatten_dict(ref)
    keys = list(state_dict.keys())
    if not load_last:
        keys = keys[:-2]
    loaded, skipped = [], []
    filled = set()
    for tkey in keys:
        mapped = _map_torch_key(tkey)
        if mapped is None:
            continue
        col, path, tag = mapped
        arr = state_dict[tkey]
        if tag == "weight":
            # decide kernel vs elementwise weight by destination presence
            cand_kernel = (col,) + path + ("kernel",)
            cand_weight = (col,) + path + ("weight",)
            cand_scale = (col,) + path + ("scale",)
            if cand_kernel in flat_ref:
                dest = cand_kernel
                if arr.ndim == 3:
                    ref_shape = flat_ref[dest].shape
                    a = arr.transpose(2, 1, 0)   # conv (O,I,K) -> (K,I,O)
                    if a.shape != ref_shape and arr.transpose(2, 0, 1).shape \
                            == ref_shape:
                        a = arr.transpose(2, 0, 1)  # deconv (I,O,K)->(K,O,I)
                    arr = a
                elif arr.ndim == 2:
                    arr = arr.T                   # linear (O,I) -> (I,O)
            elif cand_weight in flat_ref:
                dest = cand_weight
            elif cand_scale in flat_ref:
                dest = cand_scale
            else:
                skipped.append(tkey)
                continue
        elif tag == "squeeze":
            dest = (col,) + path
            arr = arr.reshape(-1)
            if dest not in flat_ref:
                skipped.append(tkey)
                continue
        elif tag == "conv_kernel":
            dest = (col,) + path
            if dest not in flat_ref:
                skipped.append(tkey)
                continue
            if arr.ndim == 3:
                arr = arr.transpose(2, 1, 0)      # (O,I,K) -> (K,I,O)
            elif arr.ndim == 2:
                arr = arr.T
        else:
            dest = (col,) + path
            if dest not in flat_ref:
                skipped.append(tkey)
                continue
            if arr.ndim == 2 and flat_ref[dest].ndim == 2 and \
                    arr.shape == flat_ref[dest].shape[::-1] and \
                    arr.shape != flat_ref[dest].shape:
                arr = arr.T
        if dest not in flat_ref or flat_ref[dest].shape != arr.shape:
            skipped.append(tkey)
            continue
        flat_ref[dest] = jnp.asarray(arr)
        filled.add(dest)
        loaded.append(tkey)
    if verbose:
        print(f"[torch_to_variables] loaded {len(loaded)} keys, "
              f"skipped {skipped}")
    if skipped and strict:
        # reference load_pretrained_ckpt refuses partial loads
        # (modules.py:290-291): unmapped/mismatched keys must not leave
        # parameters silently at random init
        raise ValueError(
            f"torch checkpoint load skipped {len(skipped)} keys "
            f"({skipped[:8]}{'...' if len(skipped) > 8 else ''}); pass "
            "strict=False to allow a partial load")
    if strict and load_last:
        # the reference also raises in the other direction (loaded-key
        # count != model-key count, modules.py:290-291): a state dict that
        # maps cleanly but covers only part of the model must not leave
        # the remaining params silently at random init (load_last=False is
        # a deliberately partial transfer, like the reference's)
        unfilled = [k for k in flat_ref
                    if k[0] == "params" and k not in filled]
        if unfilled:
            raise ValueError(
                f"torch checkpoint covers only {len(filled)} of the "
                f"model's param entries; {len(unfilled)} remain at init "
                f"({unfilled[:8]}{'...' if len(unfilled) > 8 else ''}); "
                "pass strict=False to allow a partial load")
    return freeze(unflatten_dict(flat_ref))


def rename_reference_pase_keys(state_dict: Dict[str, np.ndarray],
                               regr_names, cls_names
                               ) -> Dict[str, np.ndarray]:
    """Map a full reference `pase` model state dict (frontend. /
    regression_workers.{i}. / classification_workers.{i}.minion.) onto our
    per-worker-name scopes, ready for torch_to_variables."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("frontend."):
            out[k] = v
        elif k.startswith("regression_workers."):
            parts = k.split(".")
            name = regr_names[int(parts[1])]
            out[name + "." + ".".join(parts[2:])] = v
        elif k.startswith("classification_workers."):
            parts = k.split(".")
            name = cls_names[int(parts[1])]
            rest = parts[2:]
            if rest and rest[0] == "minion":
                rest = rest[1:]
            out[name + "." + ".".join(rest)] = v
    return out


def load_reference_pase_ckpt(ckpt_path: str, variables, workers_meta,
                             verbose: bool = False):
    """Import a full reference multi-task checkpoint (torch state dict of
    the `pase` model, e.g. a PASE-…ckpt saver file) into our variable
    tree — enables continuing a reference-trained run on TPU."""
    sd = _load_torch_state_dict(ckpt_path)
    regr_names = [e["name"] for e in workers_meta["regr"]]
    cls_names = [e["name"] for e in workers_meta["cls"]]
    sd = rename_reference_pase_keys(sd, regr_names, cls_names)
    return torch_to_variables(sd, variables, load_last=True,
                              verbose=verbose)


def torch_gru_params(state_dict: Dict[str, np.ndarray], prefix: str,
                     layer: int = 0) -> dict:
    """Convert one torch nn.GRU layer's weights to a flax GRUCell param
    dict. torch stacks gates [r|z|n] along dim 0 of weight_ih/weight_hh
    (each [3H, in]); flax GRUCell keeps six Dense modules ir/iz/in (bias)
    and hr/hz/hn (hn has bias, hr/hz do not... flax puts the h-side bias
    on 'hn' only, matching torch's b_hn; torch's b_hr/b_hz are folded
    into the i-side biases)."""
    wih = state_dict[f"{prefix}.weight_ih_l{layer}"]
    whh = state_dict[f"{prefix}.weight_hh_l{layer}"]
    bih = state_dict.get(f"{prefix}.bias_ih_l{layer}")
    bhh = state_dict.get(f"{prefix}.bias_hh_l{layer}")
    h = wih.shape[0] // 3
    w_ir, w_iz, w_in = wih[:h], wih[h:2 * h], wih[2 * h:]
    w_hr, w_hz, w_hn = whh[:h], whh[h:2 * h], whh[2 * h:]
    out = {
        "ir": {"kernel": w_ir.T}, "iz": {"kernel": w_iz.T},
        "in": {"kernel": w_in.T},
        "hr": {"kernel": w_hr.T}, "hz": {"kernel": w_hz.T},
        "hn": {"kernel": w_hn.T},
    }
    if bih is not None:
        b_ir, b_iz, b_in = bih[:h], bih[h:2 * h], bih[2 * h:]
        b_hr, b_hz, b_hn = bhh[:h], bhh[h:2 * h], bhh[2 * h:]
        # r = sigmoid(W_ir x + b_ir + W_hr h + b_hr): flax has one bias on
        # the i-side Dense -> fold torch's two biases together
        out["ir"]["bias"] = b_ir + b_hr
        out["iz"]["bias"] = b_iz + b_hz
        out["in"]["bias"] = b_in
        out["hn"]["bias"] = b_hn
    return {k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
            for k, v in out.items()}


def load_frontend_ckpt(path: str, module, variables, load_last: bool = True,
                       verbose: bool = False):
    """Load a frontend checkpoint from native .npz or torch .ckpt."""
    if path.endswith(".npz"):
        loaded, _ = load_variables(path)
        return loaded
    state_dict = _load_torch_state_dict(path)
    return torch_to_variables(state_dict, variables, load_last=load_last,
                              verbose=verbose)
