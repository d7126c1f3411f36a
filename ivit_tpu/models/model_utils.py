"""Model freeze/unfreeze lifecycle helpers (ref ``models/model_utils.py``).

In the reference, ``freeze_model`` calls ``fix()`` on every submodule
(stop updating QuantAct ranges, freeze the IBERT-LN overflow shift, cache
ppoly coefficient tables) and ``unfreeze_model`` reverses it
(``/root/reference/models/model_utils.py:5-35``).

In this framework the running/frozen distinction is functional — pass
``running_stat=True`` with ``mutable=['quant_stats']`` to update ranges,
``running_stat=False`` for frozen evaluation — so these helpers cover the
*stateful* part of fix()/unfix(): fitting or clearing the ppoly tables.
"""

from __future__ import annotations

import jax
import numpy as np


def freeze_model(model, variables: dict) -> dict:
    """'fix()' equivalent: fit ppoly tables from tracked ranges (if any).

    Returns variables ready for ``running_stat=False`` evaluation or
    ``engine.freeze_model``.
    """
    if "ppoly" in (model.gelu_type + model.softmax_type):
        from ..train.ppoly_fit import fit_ppoly_tables

        import jax.numpy as jnp
        variables = jax.tree.map(jnp.asarray,
                                 fit_ppoly_tables(model, variables))
    return variables


def unfreeze_model(model, variables: dict) -> dict:
    """'unfix()' equivalent: clear cached ppoly tables so they refit.

    Range EMAs resume updating as soon as callers pass
    ``running_stat=True`` again (reference unfix only touches QuantActs and
    ppoly caches, model_utils.py:17-35).
    """
    qs = jax.device_get(variables["quant_stats"])

    def walk(tree):
        for key, sub in tree.items():
            if isinstance(sub, dict):
                if "fitted" in sub and "coeffs" in sub:
                    sub["fitted"] = np.zeros_like(np.asarray(sub["fitted"]))
                    sub["coeffs"] = np.zeros_like(np.asarray(sub["coeffs"]))
                    sub["bounds"] = np.zeros_like(np.asarray(sub["bounds"]))
                else:
                    walk(sub)

    walk(qs)
    import jax.numpy as jnp
    return {**variables, "quant_stats": jax.tree.map(jnp.asarray, qs)}
