"""Learning-rate schedules.

Mirrors the reference's OneCycleLR(cos, pct_start=0.01) / LinearLR warm-up
(/root/reference/src/model/model_wrapper.py:792-817) in optax.
"""

from __future__ import annotations

import optax


def make_lr_schedule(
    lr: float,
    max_steps: int,
    cosine: bool = True,
    warm_up_steps: int = 2000,
    pct_start: float = 0.01,
):
    if cosine:
        # OneCycleLR: cos ramp from lr/25 ("div_factor") to lr, then cos
        # anneal to lr/1e4 ("final_div_factor", torch default).
        return optax.cosine_onecycle_schedule(
            transition_steps=max_steps + 10,
            peak_value=lr,
            pct_start=pct_start,
            div_factor=25.0,
            final_div_factor=1e4,
        )
    return optax.linear_schedule(
        init_value=lr / warm_up_steps, end_value=lr, transition_steps=warm_up_steps
    )
