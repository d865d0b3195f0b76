"""Glue between the training loop and the live SIBR viewer.

The reference polls ``network_gui`` at the top of every training iteration
and renders the requester's custom camera with the *current* model state
(``train_single.py:80-97``).  :class:`ViewerHook` packages that: construct
it with a listening :class:`~street_sparse_3dgs_tpu.viewer.network_gui.
NetworkGUI` and pass it to ``train_loop`` via ``LoopHooks.viewer_poll``.

The render is one jitted function; jax re-specializes it automatically per
requested resolution (CameraParams height/width are static pytree aux
data), so a viewer at a fixed window size costs one compile.
``req.keep_alive`` selects RGB vs inverse-depth frames exactly like the
reference (``train_single.py:88-92``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import (activate_opacity, activate_scales, sh_coeffs)
from ..ops.rasterize import rasterize


@functools.partial(jax.jit,
                   static_argnames=("meta", "sh_degree", "cfg", "depth_mode"))
def _render_view(params, active, camera, meta, sh_degree, bg, scale_modifier,
                 cfg, depth_mode):
    out = rasterize(params.xyz, activate_scales(params), params.quats,
                    activate_opacity(params, meta), sh_coeffs(params),
                    camera, sh_degree, bg, cfg,
                    scale_modifier=scale_modifier, active_mask=active)
    if depth_mode:
        img = jnp.broadcast_to(out["depth"], (3,) + out["depth"].shape[1:])
    else:
        img = out["render"]
    return jnp.clip(img, 0.0, 1.0)


class ViewerHook:
    """``LoopHooks.viewer_poll`` implementation.

    Parameters: ``gui`` (a listening NetworkGUI), ``source_path`` (the
    verify string echoed to the viewer — the dataset path on the
    reference), ``pipe`` (PipelineConfig for the raster knobs).
    """

    def __init__(self, gui, source_path: str, pipe):
        from ..train.step import raster_config

        self.gui = gui
        self.source_path = source_path
        self.cfg = raster_config(pipe)

    def __call__(self, state, meta, training_done: bool = False,
                 bg=None) -> bool:
        if bg is None:
            bg = jnp.zeros((3,), jnp.float32)

        def render_fn(req):
            img = _render_view(
                state.params, state.active, req.camera(), meta,
                meta.sh_degree, bg, jnp.float32(req.scaling_modifier),
                self.cfg, not req.keep_alive)
            return np.asarray(img)

        return self.gui.poll(render_fn, self.source_path, training_done)

    def close(self) -> None:
        self.gui.close()
