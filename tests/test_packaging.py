"""Packaging consistency: pyproject's console entry points and package list
match the tree (the wheel itself is exercised manually; see README Install).
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PYPROJECT = os.path.join(REPO, "pyproject.toml")


def _pyproject():
    with open(PYPROJECT) as f:
        return f.read()


def test_console_scripts_point_at_real_mains():
    text = _pyproject()
    specs = re.findall(
        r'^gic-[\w-]+ = "gan_image_captioning_tpu\.scripts\.(\w+):(\w+)"',
        text, re.M)
    assert len(specs) >= 13, "expected the full gic-* command set"
    for module, func in specs:
        path = os.path.join(REPO, "src", module + ".py")
        assert os.path.isfile(path), f"entry point module missing: {path}"
        with open(path) as f:
            src = f.read()
        assert re.search(rf"^def {func}\(", src, re.M), (
            f"src/{module}.py has no {func}()")


def test_packages_list_matches_tree():
    text = _pyproject()
    listed = set(re.findall(r'^\s+"(gan_image_captioning_tpu[\w.]*)",', text,
                            re.M))
    on_disk = {"gan_image_captioning_tpu"}
    pkg_root = os.path.join(REPO, "gan_image_captioning_tpu")
    for name in os.listdir(pkg_root):
        if os.path.isfile(os.path.join(pkg_root, name, "__init__.py")):
            on_disk.add(f"gan_image_captioning_tpu.{name}")
    on_disk.add("gan_image_captioning_tpu.scripts")  # package-dir → src/
    assert listed == on_disk, (listed - on_disk, on_disk - listed)
    assert os.path.isfile(os.path.join(REPO, "src", "__init__.py"))


def test_scripts_do_not_shadow_package_when_installed():
    """Every src/ script gates its repo-root sys.path insert on the checkout
    layout, so the installed scripts package never puts the package dir
    itself on sys.path (its modules would shadow top-level names)."""
    src_dir = os.path.join(REPO, "src")
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".py") or name == "__init__.py":
            continue
        with open(os.path.join(src_dir, name)) as f:
            src = f.read()
        if "sys.path.insert" not in src:
            continue
        assert 'os.path.isdir(os.path.join(_PKG_ROOT, "gan_image_captioning_tpu"))' in src, (
            f"src/{name} inserts into sys.path without the checkout gate")
