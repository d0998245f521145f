from .api import render, render_depth, RenderOutput
from .projection import ProjectedGaussians, project_gaussians

__all__ = ["render", "render_depth", "RenderOutput", "ProjectedGaussians", "project_gaussians"]
