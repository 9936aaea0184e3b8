# Sphinx configuration for ampis_tpu API docs.
#
# Mirrors the reference's autodoc setup (reference docs/conf.py,
# SURVEY.md §2a "Sphinx docs") for the TPU-native rebuild: napoleon-style
# docstrings autodoc'd per module. Build with `make -C docs/sphinx html`
# (requires sphinx; not bundled in the TPU image).
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "ampis_tpu"
author = "ampis_tpu contributors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autodoc_member_order = "bysource"
autodoc_mock_imports = [
    "jax", "jaxlib", "flax", "optax", "orbax", "chex", "einops",
    "matplotlib", "skimage", "pandas", "PIL",
]
napoleon_numpy_docstring = True
napoleon_google_docstring = False

templates_path = ["_templates"]
exclude_patterns = ["_build"]

html_theme = "alabaster"

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
}
