"""Renderers: satellite camera rays with geometric shadows; nadir DSM sweep."""

from eonerf_code_tpu.render.satellite import RenderConfig, render_rays, render_image, render_depth

__all__ = ["RenderConfig", "render_rays", "render_image", "render_depth"]
