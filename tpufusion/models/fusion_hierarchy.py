"""StyleFusion semantic-part hierarchy + fusion nets — reference C3.

The reference imports ``stylefusion.sf_hierarchy.SFHierarchyFFHQ/Car/Church``
(`code/style_fusion_simple.py:12,62-80`): a tree of semantic part nodes, each
internal node owning a small "fusion net" that blends its two children's
per-layer style codes; ``base_blender.forward(s_dict)`` walks the tree and
returns one blended style vector (`style_fusion_simple.py:164`).

The exact external fusion-net weights/architecture are not vendored in the
reference, so this is a behavioural reconstruction honouring every call-site
contract (node names, ``get_all_active_parts``, ``load_fusion_net`` from a
JSON manifest, dict-in/s-out blending).  Architecture: per style layer, a
gated blend

    g   = sigmoid(MLP([s_left ; s_right ; s_base]))       (per channel)
    out = g * s_left + (1 - g) * s_right

where ``s_base`` is the s-dict entry registered under the *internal* node's
own name — this is why the reference's swap table writes internal names like
``skin_mouth``/``face``/``bg_hair_clothes`` (`style_fusion_simple.py:95-104`).

Tree shapes (part names from the swap table and SURVEY §2 C3):
  FFHQ:   all(face(eyes, skin_mouth(mouth, skin)),
              bg_hair_clothes(hair, bg(background, shirt)))
  Car:    all(car(car_body, wheels),
              background(background_top, background_bottom))
  Church: all(body, background(background_top, background_bottom))
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpufusion.core.dtypes import Policy, default_policy


# ---------------------------------------------------------------------------
# Tree structure
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PartNode:
    name: str
    children: Tuple[str, str] | None = None  # (left, right) or leaf


def _tree(spec: Dict[str, Tuple[str, str]], leaves: Sequence[str]) -> Dict[str, PartNode]:
    nodes = {name: PartNode(name, kids) for name, kids in spec.items()}
    for leaf in leaves:
        nodes[leaf] = PartNode(leaf)
    return nodes


FFHQ_TREE = _tree(
    {
        "all": ("face", "bg_hair_clothes"),
        "face": ("eyes", "skin_mouth"),
        "skin_mouth": ("mouth", "skin"),
        "bg_hair_clothes": ("hair", "bg"),
        "bg": ("background", "shirt"),
    },
    ["eyes", "mouth", "skin", "hair", "background", "shirt"],
)

CAR_TREE = _tree(
    {
        "all": ("car", "background"),
        "car": ("car_body", "wheels"),
        "background": ("background_top", "background_bottom"),
    },
    ["car_body", "wheels", "background_top", "background_bottom"],
)

CHURCH_TREE = _tree(
    {
        "all": ("body", "background"),
        "background": ("background_top", "background_bottom"),
    },
    ["body", "background_top", "background_bottom"],
)

TREES = {"ffhq": FFHQ_TREE, "car": CAR_TREE, "church": CHURCH_TREE}

# Reference part-name aliases (e.g. car "body" refers to the car_body node).
ALIASES = {"car": {"body": "car_body"}, "ffhq": {}, "church": {}}


def get_all_active_parts(tree: Dict[str, PartNode], root: str = "all"):
    """All node names in the subtree (internal + leaves), preorder —
    the parts the drawer seeds with the base latent
    (`style_fusion_simple.py:85-87`)."""
    out = []

    def walk(name):
        out.append(name)
        node = tree[name]
        if node.children:
            for c in node.children:
                walk(c)

    walk(root)
    return out


# ---------------------------------------------------------------------------
# Fusion net
# ---------------------------------------------------------------------------


class FusionNet(nn.Module):
    """Per-layer gated blender for one internal node.

    ``style_dims`` are the channel widths of each style layer (generator
    ``style_input_dims()``); one small gate head per layer.
    """

    style_dims: Tuple[int, ...]
    hidden: int = 128
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, s_left, s_right, s_base):
        out = []
        pd = self.policy.param_dtype
        for i, dim in enumerate(self.style_dims):
            a, b, c = s_left[i], s_right[i], s_base[i]
            h = jnp.concatenate(
                [a.astype(jnp.float32), b.astype(jnp.float32), c.astype(jnp.float32)],
                axis=-1,
            )
            h = nn.Dense(self.hidden, param_dtype=pd, name=f"gate{i}_fc1")(h)
            h = jax.nn.leaky_relu(h, 0.2)
            g = jax.nn.sigmoid(nn.Dense(dim, param_dtype=pd, name=f"gate{i}_fc2")(h))
            out.append((g * a.astype(jnp.float32) + (1.0 - g) * b.astype(jnp.float32)).astype(a.dtype))
        return tuple(out)


class HierarchyBlender:
    """Container of per-node fusion nets + recursive blend (``base_blender``).

    Functional style: ``params`` is a dict node_name -> FusionNet params; the
    blend itself is pure and jittable.
    """

    def __init__(
        self,
        dataset: str,
        style_dims: Sequence[int],
        *,
        hidden: int = 128,
        policy: Optional[Policy] = None,
    ):
        if dataset not in TREES:
            raise ValueError(f"unknown dataset {dataset!r}; one of {sorted(TREES)}")
        self.dataset = dataset
        self.tree = TREES[dataset]
        self.aliases = ALIASES[dataset]
        self.style_dims = tuple(int(d) for d in style_dims)
        self.policy = policy or default_policy()
        self.net = FusionNet(self.style_dims, hidden=hidden, policy=self.policy)
        self.internal_nodes = [n for n, node in self.tree.items() if node.children]
        # set by load_fusion_nets: provenance + match quality of the loaded
        # weights (None until a manifest is loaded -> random-init blenders)
        self.load_report: Optional[dict] = None

    # -- params ------------------------------------------------------------
    def init_params(self, key: jax.Array) -> dict:
        dummy = tuple(jnp.zeros((1, d), jnp.float32) for d in self.style_dims)
        params = {}
        for i, name in enumerate(self.internal_nodes):
            params[name] = jax.jit(self.net.init)(jax.random.fold_in(key, i), dummy, dummy, dummy)
        return params

    def load_fusion_nets(self, manifest_path: str) -> dict:
        """JSON manifest {node_name: weight_path} -> params dict (reference
        ``load_fusion_net`` per node, `style_fusion_simple.py:72-80`).
        Relative paths resolve against the manifest's directory.

        Two weight formats:
        - ``.npz`` — this framework's own FusionNet save format (exact);
        - ``.pt``/``.pth`` — the REFERENCE's torch fusion-net checkpoints.
          The external ``SFHierarchy*`` architecture is not vendored
          anywhere the reference can see, so the torch linear stack is
          ingested as an OPAQUE per-style-layer MLP (see
          ``_ingest_torch_fusion_net``) and a loud approximation warning is
          emitted; ``self.load_report`` records per-node match quality so
          callers (tools/parity_check.py) cannot silently overclaim spatial
          parity.
        """
        with open(manifest_path) as f:
            manifest = json.load(f)
        root = os.path.dirname(os.path.abspath(manifest_path))
        params = {}
        report = dict(path=manifest_path, nodes={}, approx=False)
        for name, rel in manifest.items():
            path = rel if os.path.isabs(rel) else os.path.join(root, rel)
            if path.endswith((".pt", ".pth")):
                params[name], node_rep = self._ingest_torch_fusion_net(path)
                report["nodes"][name] = node_rep
                # a chained stack serving every style layer executes the
                # state dict losslessly (torch-oracle-validated forward,
                # tests/test_fusion.py) — only nodes that fall back to the
                # even blend on any layer remain approximations
                if not node_rep.get("validated"):
                    report["approx"] = True
            else:
                with np.load(path) as data:
                    flat = {k: jnp.asarray(v) for k, v in data.items()}
                params[name] = _unflatten(flat)
                report["nodes"][name] = dict(format="npz", exact=True)
        torch_nodes = {n: r for n, r in report["nodes"].items()
                       if r.get("format") == "torch"}
        bad = {n: r.get("layers_served") for n, r in torch_nodes.items()
               if not r.get("validated")}
        if bad:
            print("[fusion_hierarchy] WARNING: torch fusion-net checkpoints "
                  "ingested as opaque MLPs — the reference's SFHierarchy "
                  "architecture is not vendored, so gating conventions are "
                  "inferred from tensor shapes (approximation). Nodes with "
                  f"unserved style layers (even-blend fallback): {bad}")
        elif torch_nodes:
            print("[fusion_hierarchy] torch fusion-net checkpoints ingested "
                  "as chained MLPs serving every style layer; the MLP "
                  "forward is torch-oracle-validated (tests/test_fusion.py), "
                  "gating convention inferred from widths")
        self.load_report = report
        return params

    def _ingest_torch_fusion_net(self, path: str):
        """Best-effort ingestion of a reference torch fusion-net state dict.

        Extracts the ordered linear stack (2-D ``*.weight`` + ``*.bias``
        pairs; torch state dicts preserve module order) into an opaque MLP
        bundle ``{"__torch_mlp__": [{"kernel", "bias"}, ...]}``.  At blend
        time the MLP is applied per style layer wherever its input width
        matches ``3*dim`` (left;right;base), ``2*dim`` (left;right) or
        ``dim`` (base), its output interpreted as gate logits when it is
        ``dim``-wide; non-matching layers fall back to the even blend and
        are counted in the report."""
        from tpufusion.io import load_torch_state_dict

        state = load_torch_state_dict(path)
        # common torch checkpoint wrappers
        for wrapper in ("state_dict", "model", "net"):
            if wrapper in state and isinstance(state[wrapper], dict):
                state = state[wrapper]
                break
        layers = []
        for k, v in state.items():
            if not k.endswith(".weight"):
                continue
            w = np.asarray(v)
            if w.ndim != 2:
                continue
            bkey = k[: -len(".weight")] + ".bias"
            b = np.asarray(state[bkey]) if bkey in state else np.zeros(
                w.shape[0], w.dtype)
            # torch Linear stores (out, in); our kernels are (in, out)
            layers.append(dict(kernel=jnp.asarray(w.T), bias=jnp.asarray(b)))
        if not layers:
            raise ValueError(
                f"{path}: no linear layers found in the torch state dict "
                f"(keys: {sorted(state)[:8]}...) — cannot ingest as a "
                "fusion net")
        # the ingested stack is assumed to be ONE chained MLP; a checkpoint
        # with parallel heads / extra 2-D params would only surface as an
        # opaque matmul shape error inside jit at blend time (ADVICE r3) —
        # validate the chain here and fall back to the even blend instead.
        for j in range(len(layers) - 1):
            w_out = int(layers[j]["kernel"].shape[1])
            w_in = int(layers[j + 1]["kernel"].shape[0])
            if w_out != w_in:
                rep = dict(
                    format="torch", n_linear=len(layers), chained=False,
                    mismatch=f"layer {j} out={w_out} vs layer {j + 1} "
                             f"in={w_in}",
                    layers_served="0 (even-blend fallback: the 2-D weights "
                                  "in this checkpoint do not form one "
                                  "chained MLP)")
                print(f"[fusion_hierarchy] WARNING: {path}: {rep['mismatch']}"
                      " — not a single chained MLP; using even blend for "
                      "this node")
                return {"__even_blend__": True}, rep
        fin = int(layers[0]["kernel"].shape[0])
        fout = int(layers[-1]["kernel"].shape[1])
        served = [d for d in set(self.style_dims)
                  if fin in (d, 2 * d, 3 * d) and fout == d]
        n_served = sum(1 for d in self.style_dims if d in served)
        rep = dict(format="torch", n_linear=len(layers), in_features=fin,
                   out_features=fout,
                   # validated: the chained stack serves EVERY style layer —
                   # the state dict executes losslessly (torch-oracle parity
                   # test); only the gating convention remains inferred
                   validated=n_served == len(self.style_dims),
                   layers_served=f"{n_served}/{len(self.style_dims)}")
        return {"__torch_mlp__": layers}, rep

    def save_fusion_nets(self, params: dict, out_dir: str, manifest_name: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        manifest = {}
        for name, p in params.items():
            path = os.path.join(out_dir, f"fusion_net_{name}.npz")
            np.savez(path, **_flatten(p))
            manifest[name] = os.path.basename(path)
        mpath = os.path.join(out_dir, manifest_name)
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=2)
        return mpath

    # -- blending ----------------------------------------------------------
    def resolve(self, name: str) -> str:
        return self.aliases.get(name, name)

    def forward(self, params: dict, s_dict: dict, root: str = "all"):
        """Blend the s-dict through the tree; returns one style pytree.

        ``s_dict`` maps part name -> style pytree (tuple of (N, C_l)).  Every
        node name of the tree must be present (the drawer seeds all of them
        with the base latent before swapping, `style_fusion_simple.py:85-87`).
        """

        def walk(name):
            node = self.tree[name]
            if not node.children:
                return s_dict[name]
            left = walk(node.children[0])
            right = walk(node.children[1])
            base = s_dict[name]
            p = params[name]
            if isinstance(p, dict) and "__even_blend__" in p:
                return tuple(
                    (0.5 * (a.astype(jnp.float32) + b_.astype(jnp.float32))
                     ).astype(a.dtype)
                    for a, b_ in zip(left, right))
            if isinstance(p, dict) and "__torch_mlp__" in p:
                return self._apply_torch_mlp(p["__torch_mlp__"], left, right, base)
            return self.net.apply(p, left, right, base)

        return walk(root)

    def _apply_torch_mlp(self, layers, left, right, base):
        """Apply an ingested reference torch fusion net (opaque linear stack,
        see ``_ingest_torch_fusion_net``) per style layer.  Input/gating
        conventions are inferred from widths; style layers the net cannot
        serve fall back to the even blend."""
        fin = int(layers[0]["kernel"].shape[0])
        fout = int(layers[-1]["kernel"].shape[1])
        out = []
        for i, d in enumerate(self.style_dims):
            a, b_, c = left[i], right[i], base[i]
            af, bf, cf = (x.astype(jnp.float32) for x in (a, b_, c))
            if fout != d or fin not in (d, 2 * d, 3 * d):
                out.append((0.5 * (af + bf)).astype(a.dtype))
                continue
            if fin == 3 * d:
                x = jnp.concatenate([af, bf, cf], axis=-1)
            elif fin == 2 * d:
                x = jnp.concatenate([af, bf], axis=-1)
            else:
                x = cf
            for j, lay in enumerate(layers):
                x = x @ lay["kernel"].astype(jnp.float32) + lay["bias"].astype(
                    jnp.float32)
                if j < len(layers) - 1:
                    x = jax.nn.leaky_relu(x, 0.2)
            g = jax.nn.sigmoid(x)
            out.append((g * af + (1.0 - g) * bf).astype(a.dtype))
        return tuple(out)


def _flatten(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            flat.update(_flatten(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
