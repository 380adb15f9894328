"""Bidirectional conversion between our param pytrees and the reference's
PyTorch ``state_dict`` layout.

``from_reference_state_dict`` loads released ReReVST checkpoints
(``style_net-TIP-final.pth``; schema at ``test/framework.py:74-78``) into the
TPU model; ``to_reference_state_dict`` exports our params so the original
PyTorch code can run them (used by the parity test suite as a live oracle).

state_dict naming (from the reference module trees):
  Encoder.slice.<i>.{weight,bias}        i in {0,2,5,7,10,12,14,16,19}
  EncoderStyle.slice<k>.<i>.*            k slices keep torchvision indices
  Vgg19.slice<k>.<i>.*                   (loss net; optional)
  Decoder.slice{4,3,2}.{conv1,conv2,conv_shortcut}.*
  Decoder.slice1.*                       final 64->3 conv
  Decoder.Filter{1,2,3}.{down_sample.0,upsample.0,F1.down_sample.0,F1.FC,F2...}
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from rerevst_tpu.models.layers import from_torch_conv, from_torch_linear

#: our vgg conv name -> (EncoderStyle/Vgg19 slice name, torchvision index)
_VGG_SLICED = {
    "conv1_1": ("slice1", 0),
    "conv1_2": ("slice2", 2),
    "conv2_1": ("slice2", 5),
    "conv2_2": ("slice3", 7),
    "conv3_1": ("slice3", 10),
    "conv3_2": ("slice4", 12),
    "conv3_3": ("slice4", 14),
    "conv3_4": ("slice4", 16),
    "conv4_1": ("slice4", 19),
}

_RES_MAP = {"res4": "slice4", "res3": "slice3", "res2": "slice2"}
_RES_CONVS = {"conv1": "conv1", "conv2": "conv2", "shortcut": "conv_shortcut"}


def _np(x):
    """torch tensor or array-like -> numpy."""
    if hasattr(x, "detach"):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_to_torch(p) -> Dict[str, np.ndarray]:
    out = {"weight": np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))}
    if "b" in p:
        out["bias"] = np.asarray(p["b"])
    return out


def _linear_to_torch(p) -> Dict[str, np.ndarray]:
    return {"weight": np.transpose(np.asarray(p["w"])),
            "bias": np.asarray(p["b"])}


def to_reference_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}

    def put(prefix, tensors):
        for k, v in tensors.items():
            sd[f"{prefix}.{k}"] = v

    if "encoder" in params:
        for name, (_, idx) in _VGG_SLICED.items():
            put(f"Encoder.slice.{idx}", _conv_to_torch(params["encoder"][name]))
    for tree_key, mod in (("encoder_style", "EncoderStyle"), ("vgg_loss", "Vgg19")):
        if tree_key in params:
            for name, (slc, idx) in _VGG_SLICED.items():
                put(f"{mod}.{slc}.{idx}", _conv_to_torch(params[tree_key][name]))

    dec = params.get("decoder")
    if dec is not None:
        for ours, theirs in _RES_MAP.items():
            for ck, tk in _RES_CONVS.items():
                put(f"Decoder.{theirs}.{tk}", _conv_to_torch(dec[ours][ck]))
        put("Decoder.slice1", _conv_to_torch(dec["out"]))
        for i in (1, 2, 3):
            fname = f"filter{i}"
            if fname not in dec:
                continue
            fp = dec[fname]
            put(f"Decoder.Filter{i}.down_sample.0", _conv_to_torch(fp["down"]))
            put(f"Decoder.Filter{i}.upsample.0", _conv_to_torch(fp["up"]))
            for pk, pt in (("p1", "F1"), ("p2", "F2")):
                put(f"Decoder.Filter{i}.{pt}.down_sample.0",
                    _conv_to_torch(fp[pk]["down"]))
                put(f"Decoder.Filter{i}.{pt}.FC", _linear_to_torch(fp[pk]["fc"]))
    return sd


def from_reference_state_dict(state_dict: Dict, dtype=np.float32) -> Dict:
    """Convert a reference checkpoint (torch tensors or arrays) to params."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(prefix):
        return from_torch_conv(sd[f"{prefix}.weight"],
                               sd.get(f"{prefix}.bias"), dtype)

    params: Dict = {}
    if "Encoder.slice.0.weight" in sd:
        params["encoder"] = {
            name: conv(f"Encoder.slice.{idx}")
            for name, (_, idx) in _VGG_SLICED.items()
        }
    for tree_key, mod in (("encoder_style", "EncoderStyle"), ("vgg_loss", "Vgg19")):
        if f"{mod}.slice1.0.weight" in sd:
            params[tree_key] = {
                name: conv(f"{mod}.{slc}.{idx}")
                for name, (slc, idx) in _VGG_SLICED.items()
            }

    if "Decoder.slice4.conv1.weight" in sd:
        dec: Dict = {}
        for ours, theirs in _RES_MAP.items():
            dec[ours] = {
                ck: conv(f"Decoder.{theirs}.{tk}")
                for ck, tk in _RES_CONVS.items()
            }
        dec["out"] = conv("Decoder.slice1")
        for i in (1, 2, 3):
            pre = f"Decoder.Filter{i}"
            if f"{pre}.down_sample.0.weight" not in sd:
                continue
            dec[f"filter{i}"] = {
                "down": conv(f"{pre}.down_sample.0"),
                "up": conv(f"{pre}.upsample.0"),
                "p1": {
                    "down": conv(f"{pre}.F1.down_sample.0"),
                    "fc": from_torch_linear(sd[f"{pre}.F1.FC.weight"],
                                            sd[f"{pre}.F1.FC.bias"], dtype),
                },
                "p2": {
                    "down": conv(f"{pre}.F2.down_sample.0"),
                    "fc": from_torch_linear(sd[f"{pre}.F2.FC.weight"],
                                            sd[f"{pre}.F2.FC.bias"], dtype),
                },
            }
        params["decoder"] = dec
    return params


def load_reference_checkpoint(path: str, dtype=np.float32) -> Dict:
    """Load a ReReVST ``.pth`` checkpoint into a TPU-model param pytree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return from_reference_state_dict(sd, dtype)


# --- LoadPretrained: the reference's 3-stage fallback -----------------------

#: Ancient ReReVST schema: an extra 512->512 1x1 conv the reference tolerates
#: by temporarily attaching a dummy module (``train/train.py:144-146``).
_LEGACY_KEYS = ("Decoder.conv_kernel.weight", "Decoder.conv_kernel.bias")


def _covers(partial, template) -> bool:
    """Does `partial` provide every subtree/leaf of `template`?"""
    if isinstance(template, dict):
        if not isinstance(partial, dict):
            return False
        return all(k in partial and _covers(partial[k], template[k])
                   for k in template)
    return np.shape(partial) == np.shape(template)


def _graft(template, partial, path=""):
    """Overlay `partial` onto `template` (template keys only; shapes must
    match where provided).  Leaves are cast to the template leaf's dtype."""
    if isinstance(template, dict):
        part = partial if isinstance(partial, dict) else {}
        return {k: _graft(v, part.get(k), f"{path}.{k}" if path else k)
                for k, v in template.items()}
    if partial is None:
        return template
    t = np.asarray(template)
    p = np.asarray(partial)
    if p.shape != t.shape:
        raise ValueError(
            f"pretrained leaf {path}: shape {p.shape} != model {t.shape}")
    return p.astype(t.dtype)


def graft_pretrained_state_dict(state_dict: Dict, template: Dict,
                                dtype=np.float32):
    """The reference's 3-stage ``LoadPretrained`` (``train/train.py:124-146``)
    as a functional graft onto `template` (a freshly-initialised pytree):

    1. ``direct``  — the checkpoint covers the whole template tree.
    2. ``subtree`` — a flags-off / half-pretrained checkpoint (e.g. no
       ``Filter*`` or ``Vgg19``): graft Encoder / EncoderStyle /
       Decoder.slice1-4 and keep the template's dynamic filters + loss net,
       exactly what the reference's module-copy graft does.
    3. ``legacy``  — the old ``Decoder.conv_kernel`` schema: the extra keys
       are stripped (the reference attaches a dummy conv, loads, deletes it).

    Returns ``(params, stage)``.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    stage = "direct"
    if any(k in sd for k in _LEGACY_KEYS):
        stage = "legacy"
        for k in _LEGACY_KEYS:
            sd.pop(k, None)
    partial = from_reference_state_dict(sd, dtype)
    if not partial:
        raise ValueError("state_dict contains no recognizable ReReVST keys")
    if stage == "direct" and not _covers(partial, template):
        stage = "subtree"
    return _graft(template, partial), stage


# --- Full train-state interop (G + D + optimizer) ---------------------------
#
# The reference saves a training-checkpoint trio every best-loss log point
# (``train/train.py:446-457``): ``optimizer-epoch-N.pth`` (torch Adam
# state_dict), ``style_net-latest-epoch-1(...).pth`` (G weights; epoch
# hardcoded to 1 in the name, §2.4), and ``netD-epoch-N.pth``; resume globs
# ``style_net-epoch-N*.pth`` + reloads netD (``train/train.py:148-153,
# 281-284``) and never actually reloads the optimizer file.  The exporters
# below write that trio under the resume-globbable names so a torch run can
# pick our training up drop-in; the importer takes the trio (optimizer
# included) back into a native TrainState.


def reference_trainable_param_order():
    """The reference training net's trainable-parameter registration order
    (``named_parameters()`` with ``requires_grad`` — Decoder, Encoder,
    EncoderStyle; Vgg19 is construction-frozen,
    ``train/style_networks.py:300-302``).  This is the index order of
    ``optim.Adam(filter(requires_grad, style_net.parameters()))``
    (``train/train.py:175``), verified against the live oracle in tests.
    """
    names = []
    for s in ("slice4", "slice3", "slice2"):
        names += [f"Decoder.{s}.conv1.weight", f"Decoder.{s}.conv1.bias",
                  f"Decoder.{s}.conv2.weight", f"Decoder.{s}.conv2.bias",
                  f"Decoder.{s}.conv_shortcut.weight"]
    names += ["Decoder.slice1.weight", "Decoder.slice1.bias"]
    for i in (1, 2, 3):
        p = f"Decoder.Filter{i}"
        names += [f"{p}.down_sample.0.weight", f"{p}.down_sample.0.bias",
                  f"{p}.upsample.0.weight", f"{p}.upsample.0.bias"]
        for F in ("F1", "F2"):
            names += [f"{p}.{F}.down_sample.0.weight",
                      f"{p}.{F}.down_sample.0.bias",
                      f"{p}.{F}.FC.weight", f"{p}.{F}.FC.bias"]
    for idx in (0, 2, 5, 7, 10, 12, 14, 16, 19):
        names += [f"Encoder.slice.{idx}.weight", f"Encoder.slice.{idx}.bias"]
    for slc, idx in (("slice1", 0), ("slice2", 2), ("slice2", 5),
                     ("slice3", 7), ("slice3", 10), ("slice4", 12),
                     ("slice4", 14), ("slice4", 16), ("slice4", 19)):
        names += [f"EncoderStyle.{slc}.{idx}.weight",
                  f"EncoderStyle.{slc}.{idx}.bias"]
    return names


def _find_adam_state(opt_state):
    """Locate the (single) ScaleByAdamState inside an optax state tree."""
    import optax

    found = []

    def walk(s):
        if isinstance(s, optax.ScaleByAdamState):
            found.append(s)
        elif hasattr(s, "_fields"):
            for f in s._fields:
                walk(getattr(s, f))
        elif isinstance(s, (list, tuple)):
            for x in s:
                walk(x)
        elif isinstance(s, dict):
            for x in s.values():
                walk(x)

    walk(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"expected exactly one Adam state in the optimizer tree, "
            f"found {len(found)}")
    return found[0]


_TRAINABLE_SUBTREES = ("decoder", "encoder", "encoder_style")


def adam_state_to_torch(opt_state, lr: float = 1e-4) -> Dict:
    """Our optax Adam moments -> a torch ``optim.Adam.state_dict()`` blob,
    param indices in the reference's trainable order."""
    import optax

    adam = _find_adam_state(opt_state)
    step = int(np.asarray(adam.count))
    order = reference_trainable_param_order()
    mom_sd = {}
    for which, tree in (("exp_avg", adam.mu), ("exp_avg_sq", adam.nu)):
        sub = {k: tree[k] for k in _TRAINABLE_SUBTREES if k in tree}
        if any(isinstance(v, optax.MaskedNode) for v in sub.values()):
            raise ValueError(
                "optimizer state has frozen encoder subtrees "
                "(train_only_decoder?) — the reference Adam covers "
                "Decoder+Encoder+EncoderStyle, cannot export")
        mom_sd[which] = to_reference_state_dict(sub)
    import torch

    state = {}
    for i, name in enumerate(order):
        state[i] = {
            "step": torch.tensor(float(step)),
            "exp_avg": torch.from_numpy(
                np.ascontiguousarray(mom_sd["exp_avg"][name])),
            "exp_avg_sq": torch.from_numpy(
                np.ascontiguousarray(mom_sd["exp_avg_sq"][name])),
        }
    group = {"lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
             "weight_decay": 0, "amsgrad": False, "maximize": False,
             "foreach": None, "capturable": False, "differentiable": False,
             "fused": None, "params": list(range(len(order)))}
    return {"state": state, "param_groups": [group]}


def adam_state_from_torch(torch_sd: Dict, opt_state, params: Dict):
    """Inverse of ``adam_state_to_torch``: inject a torch Adam state_dict's
    moments into a freshly-initialised optax state (template `opt_state`)."""
    import optax

    order = reference_trainable_param_order()
    state = torch_sd["state"]
    # torch keys may be int or str depending on the pickler.
    get = lambda i: state[i] if i in state else state[str(i)]  # noqa: E731
    mu_sd = {order[i]: _np(get(i)["exp_avg"]) for i in range(len(order))}
    nu_sd = {order[i]: _np(get(i)["exp_avg_sq"]) for i in range(len(order))}
    count = int(float(_np(get(0)["step"])))
    mu_part = from_reference_state_dict(mu_sd)
    nu_part = from_reference_state_dict(nu_sd)

    def merge(old, new):
        if isinstance(old, dict):
            part = new if isinstance(new, dict) else {}
            return {k: merge(v, part.get(k)) for k, v in old.items()}
        if new is None:
            return old  # frozen subtree (MaskedNode / untouched zeros)
        return np.asarray(new, dtype=np.asarray(old).dtype) \
            if not isinstance(old, optax.MaskedNode) else old

    def rebuild(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=np.asarray(count, np.int32),
                mu=merge(s.mu, mu_part), nu=merge(s.nu, nu_part))
        if hasattr(s, "_fields"):
            return type(s)(*[rebuild(getattr(s, f)) for f in s._fields])
        if isinstance(s, tuple):
            return tuple(rebuild(x) for x in s)
        if isinstance(s, dict):
            return {k: rebuild(v) for k, v in s.items()}
        return s

    return rebuild(opt_state), count


def discriminator_to_torch_state(params: Dict) -> Dict[str, np.ndarray]:
    """Our PatchGAN params -> the reference ``NLayerDiscriminator``
    state_dict (Sequential indices: conv@0, (conv,bn)@(2,3),(5,6), final
    stride-1 (conv,bn)@(8,9), out conv@11 — ``train/other_networks.py:300-
    344``).  BatchNorm running stats are emitted as identity (the reference
    trains D in train mode, batch statistics)."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(idx, p):
        sd[f"model.{idx}.weight"] = np.transpose(np.asarray(p["w"]),
                                                 (3, 2, 0, 1))
        if "b" in p:
            sd[f"model.{idx}.bias"] = np.asarray(p["b"])

    def put_bn(idx, p):
        c = np.asarray(p["scale"]).shape[0]
        sd[f"model.{idx}.weight"] = np.asarray(p["scale"])
        sd[f"model.{idx}.bias"] = np.asarray(p["bias"])
        sd[f"model.{idx}.running_mean"] = np.zeros(c, np.float32)
        sd[f"model.{idx}.running_var"] = np.ones(c, np.float32)
        sd[f"model.{idx}.num_batches_tracked"] = np.asarray(0)

    put_conv(0, params["conv0"])
    put_conv(2, params["conv1"])
    put_bn(3, params["bn1"])
    put_conv(5, params["conv2"])
    put_bn(6, params["bn2"])
    put_conv(8, params["conv3"])
    put_bn(9, params["bn3"])
    put_conv(11, params["conv_out"])
    return sd


def discriminator_from_torch_state(state_dict: Dict,
                                   dtype=np.float32) -> Dict:
    """Reference ``netD-epoch-N.pth`` -> our PatchGAN params (running stats
    dropped: train-mode BatchNorm uses batch statistics)."""
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(idx):
        return from_torch_conv(sd[f"model.{idx}.weight"],
                               sd.get(f"model.{idx}.bias"), dtype)

    def bn(idx):
        return {"scale": sd[f"model.{idx}.weight"].astype(dtype),
                "bias": sd[f"model.{idx}.bias"].astype(dtype)}

    return {"conv0": conv(0), "conv1": conv(2), "bn1": bn(3),
            "conv2": conv(5), "bn2": bn(6), "conv3": conv(8), "bn3": bn(9),
            "conv_out": conv(11)}


def export_train_checkpoint(out_dir: str, epoch: int, params: Dict,
                            opt_state=None, d_params: Dict = None,
                            lr: float = 1e-4) -> Dict[str, str]:
    """Write the reference's training-checkpoint trio so a torch run resumes
    our training drop-in: ``style_net-epoch-{N}.pth`` (matches the resume
    glob ``train/train.py:148-153``), ``optimizer-epoch-{N}.pth``, and
    ``netD-epoch-{N}.pth``.  Returns {artifact: path}."""
    import os

    import torch

    os.makedirs(out_dir, exist_ok=True)
    out = {}

    def save(name, blob):
        path = os.path.join(out_dir, name)
        torch.save(blob, path)
        out[name.split("-")[0]] = path

    save(f"style_net-epoch-{epoch}.pth",
         {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in to_reference_state_dict(params).items()})
    if opt_state is not None:
        save(f"optimizer-epoch-{epoch}.pth",
             adam_state_to_torch(opt_state, lr))
    if d_params is not None:
        save(f"netD-epoch-{epoch}.pth",
             {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in discriminator_to_torch_state(d_params).items()})
    return out


def import_train_checkpoint(style_pth: str, params_template: Dict,
                            opt_state_template, optimizer_pth: str = None,
                            netd_pth: str = None, dtype=np.float32):
    """The inverse: reference trio -> (params, opt_state, step, d_params).
    Missing pieces keep the template (fresh) values; `step` is the torch
    Adam step count (0 when no optimizer file)."""
    import torch

    params, _ = load_pretrained(style_pth, params_template, dtype)
    opt_state, step = opt_state_template, 0
    if optimizer_pth is not None:
        sd = torch.load(optimizer_pth, map_location="cpu",
                        weights_only=False)
        opt_state, step = adam_state_from_torch(sd, opt_state_template,
                                                params)
    d_params = None
    if netd_pth is not None:
        sd = torch.load(netd_pth, map_location="cpu", weights_only=True)
        d_params = discriminator_from_torch_state(sd, dtype)
    return params, opt_state, step, d_params


def load_pretrained(path: str, template: Dict, dtype=np.float32):
    """Initialise training from a checkpoint in any supported format:
    reference ``.pth`` (with the 3-stage fallback above) or our native
    ``.msgpack`` (bare params or a full train-state blob; missing subtrees
    keep the template init).  Returns ``(params, stage)``."""
    if path.endswith(".msgpack"):
        from rerevst_tpu.io.checkpoint import load_params

        raw = load_params(path)
        if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
            raw = raw["params"]
        stage = "direct" if _covers(raw, template) else "subtree"
        return _graft(template, raw), stage
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return graft_pretrained_state_dict(sd, template, dtype)
