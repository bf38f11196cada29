from .renderer import export_scene_json, render_topdown  # noqa: F401
