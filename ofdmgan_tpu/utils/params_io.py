"""Checkpoint param-tree loading shared by the serving/eval CLIs.

Two artifact shapes exist in this repo (both produced by the trainer /
scripts/extract_champion.py):

* flat ``.npz`` champion files — keys are ``/``-joined tree paths
  (``params/enc1/conv_kernel``), values numpy arrays;
* Orbax checkpoint directories — full trainer state (``params_g`` +
  optimizer states + optional ``ema_params_g`` subdir).

Reference counterpart: the torch reference loads ``best_model.pt`` state
dicts (reference train.py checkpoint handling); here the serving path is
framework-native JAX trees.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any


def load_params_tree(path: str, ema: bool = False) -> Any:
    """Load a generator param tree from a .npz champion or an Orbax dir.

    ``ema`` selects the ``ema_params_g`` subtree of an Orbax checkpoint
    (errors on .npz — extract the EMA subtree first with
    scripts/extract_champion.py --ema).
    """
    import numpy as np

    if str(path).endswith(".npz"):
        if ema:
            raise SystemExit(
                f"--ema has no effect on flat .npz artifacts ({path}): extract "
                "the EMA subtree first with scripts/extract_champion.py --ema")
        flat = np.load(path)
        params: dict = {}
        for p, arr in flat.items():
            node, keys = params, p.split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = arr
        return params

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if ema:
        return ckptr.restore(str(Path(path).absolute() / "ema_params_g"))
    restored = ckptr.restore(str(Path(path).absolute()))
    return restored["params_g"] if "params_g" in restored else restored
