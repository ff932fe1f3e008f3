"""CLI entry points.

From a checkout these run as plain scripts (``python src/main.py`` — the
reference's canonical invocation, ``sbatch_script.s:16``); when the package
is pip-installed this same directory ships as
``gan_image_captioning_tpu.scripts`` with ``gic-*`` console commands
(pyproject.toml ``[project.scripts]``).
"""
