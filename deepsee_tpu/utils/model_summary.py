"""Parameter counting / model summaries (reference: util/model_summary.py +
BaseNetwork.print_network, base_network.py:18-26)."""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import numpy as np


def count_params(tree: Mapping) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree)))


def summarize(variables_by_net: Dict[str, Mapping]) -> str:
    """variables_by_net: e.g. {"SR": g_vars, "D": d_vars, "E": e_vars}."""
    lines = []
    for name, variables in variables_by_net.items():
        if not variables:
            continue
        n = count_params(variables.get("params", variables))
        lines.append(f"Network [{name}] was created. Total number of "
                     f"parameters: {n / 1e6:.1f} million.")
    return "\n".join(lines)
