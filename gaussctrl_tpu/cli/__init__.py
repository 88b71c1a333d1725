"""Command-line entry points (the reference's nerfstudio plugin surface).

  python -m gaussctrl_tpu.cli.train   ~  ns-train gaussctrl  (gc_config.py:40)
  python -m gaussctrl_tpu.cli.render  ~  ns-gaussctrl-render (gc_render.py:875)

Dotted flags mirror the reference CLI (`--pipeline.edit_prompt ...`,
README.md:113).
"""
