"""Environment parity checks for docker/Dockerfile.

The image itself cannot be built in this sandbox (no container tooling,
no egress — the Dockerfile carries an UNTESTED banner for that), but its
load-bearing claim CAN be checked: that the pip layers cover every
third-party import anywhere in ``hgr_tpu/`` and ``cli/``, so a networked
`docker build` produces an image where the framework actually runs.
Mirrors the role of the reference's docker/Dockerfile:1-24 (the
environment component, SURVEY.md §2a #18).
"""

import ast
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
DOCKERFILE = REPO / "docker" / "Dockerfile"

# import name -> pip requirement name as it appears in the Dockerfile.
IMPORT_TO_PIP = {
    "jax": "jax",
    "flax": "flax",
    "optax": "optax",
    "orbax": "orbax-checkpoint",
    "numpy": "numpy",
    "yaml": "pyyaml",
    "cv2": "opencv-python-headless",
    "PIL": "pillow",
    "matplotlib": "matplotlib",
    "sklearn": "scikit-learn",
    "tensorboard": "tensorboard",
    "tqdm": "tqdm",
    "einops": "einops",
    "chex": "chex",
    "torch": "torch",
    "onnx": "onnx",
    "mediapipe": "mediapipe",
}

# Imports that only exist inside tooling that runs the REFERENCE repo
# beside ours (the head-to-head harness spawns /root/reference's stack);
# they are sandbox-side comparison deps, not framework deps, and each
# importing file must declare itself as such in its docstring.
REFERENCE_SIDE = {"lightning", "libs", "model", "torchvision"}


def _dockerfile_packages():
    text = DOCKERFILE.read_text().replace("\\\n", " ")
    pkgs = set()
    for m in re.finditer(r"pip install[^\n]*", text):
        for tok in m.group(0).split():
            tok = tok.strip('"')
            if tok.startswith(("-", "pip", "install", "https://", "||", "true", "&&")):
                continue
            pkgs.add(re.split(r"[\[<>=]", tok)[0])
    return pkgs


def _source_imports():
    per_file = {}
    for root in ("hgr_tpu", "cli"):
        for p in (REPO / root).rglob("*.py"):
            mods = set()
            tree = ast.parse(p.read_text())
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    mods.update(a.name.split(".")[0] for a in node.names)
                elif isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
                    mods.add(node.module.split(".")[0])
            per_file[p] = mods
    return per_file


def test_dockerfile_covers_all_third_party_imports():
    pkgs = _dockerfile_packages()
    std = set(sys.stdlib_module_names)
    missing = {}
    for path, mods in _source_imports().items():
        for mod in mods:
            if mod in std or mod == "hgr_tpu":
                continue
            if mod in REFERENCE_SIDE:
                # must be the declared comparison harness, not prod code
                doc = ast.get_docstring(ast.parse(path.read_text())) or ""
                assert "reference" in doc.lower(), (
                    f"{path} imports reference-side module {mod!r} but does "
                    "not declare itself a reference-comparison harness")
                continue
            pip_name = IMPORT_TO_PIP.get(mod)
            if pip_name is None or pip_name not in pkgs:
                missing.setdefault(str(path.relative_to(REPO)), []).append(mod)
    assert not missing, (
        f"imports not covered by docker/Dockerfile pip layers: {missing}")


def test_dockerfile_builds_native_runtime_and_has_banner():
    text = DOCKERFILE.read_text()
    assert "native/build.sh" in text, "image must build the C++ runtime"
    assert (REPO / "native" / "build.sh").exists()
    assert "UNTESTED" in text, (
        "the never-built-in-sandbox banner must stay until a networked "
        "docker build has run the test suite inside the image")
    # every apt/pip layer cleans its cache (keeps the claim in the banner
    # honest that the file is production-shaped, not a sketch)
    assert "--no-cache-dir" in text and "rm -rf /var/lib/apt/lists" in text
