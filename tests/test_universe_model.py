"""Model-based check of the traversal universe (S3).

`_model_entries` transcribes the reference's recursive traversal
(/root/reference/src/entries/mod.rs:65-145: the is_dir short-circuit,
the four-arm match on (matched, (mode, deeper)), Depth::deeper) directly
over an in-memory tree; `entry_universe` must agree with it on randomly
generated trees for every mode and several depth limits.

Filter matching follows FilterRules::is_included (filter.rs:61-86) with
the dict-axis API both implementations share.
"""

from __future__ import annotations

import random
import re

import pytest

from refine_spark.universe import entry_universe

MODES = {
    "files": "Files",
    "dirs_stop": "DirsStop",
    "dirs_and_content": "DirsAndContent",
    "content_over_dirs": "ContentOverDirs",
}


# --- python model ----------------------------------------------------------


def _axis_ok(value: str, axis: str, include: dict | None, exclude: dict | None) -> bool:
    if exclude and axis in exclude and re.search(exclude[axis], value, re.I):
        return False
    if include and axis in include and not re.search(include[axis], value, re.I):
        return False
    return True


def _dir_matched(name, path, include, exclude):
    return (
        not name.startswith(".")
        and _axis_ok(path, "all", include, exclude)
        and _axis_ok(name, "dir", include, exclude)
        and _axis_ok(path, "path", include, exclude)
    )


def _file_matched(parent_path, parent_name, name, include, exclude):
    stem = re.sub(r"(?<=.)\.[^.]+$", "", name)
    m = re.search(r"(?<=.)\.([^.]+)$", name)
    ext = m.group(1) if m else ""
    return (
        not stem.startswith(".")
        and _axis_ok(f"{parent_path}/{stem}", "all", include, exclude)
        and _axis_ok(stem, "file", include, exclude)
        and _axis_ok(ext, "ext", include, exclude)
        and _axis_ok(parent_name, "dir", include, exclude)
        and _axis_ok(parent_path, "path", include, exclude)
    )


def _model_entries(tree, path, name, level, mode, max_depth, include, exclude):
    """Yield (path, is_dir) like entries() (mod.rs:65-117). `tree` maps
    child name -> subtree dict (dir) or None (file); `path` is the dir
    being listed, `level` its level."""
    out = []
    for child, sub in sorted(tree.items()):
        cpath = f"{path}/{child}"
        if sub is None:  # file
            if _file_matched(path, name, child, include, exclude) and not child.startswith("."):
                out.append((cpath, False))
            continue
        matched = _dir_matched(child, cpath, include, exclude)
        # Depth::deeper at the CURRENT listing: entering the child needs
        # level+1 < max (or unlimited)
        deeper = max_depth == 0 or (level + 1) < max_depth
        if matched and (
            (mode in ("dirs_and_content", "content_over_dirs") and not deeper)
            or mode == "dirs_stop"
        ):
            out.append((cpath, True))
            if mode == "dirs_and_content" and deeper:
                out += _model_entries(
                    sub, cpath, child, level + 1, mode, max_depth, include, exclude
                )
        elif matched and mode == "dirs_and_content":
            out.append((cpath, True))
            out += _model_entries(
                sub, cpath, child, level + 1, mode, max_depth, include, exclude
            )
        elif deeper and not child.startswith("."):
            out += _model_entries(
                sub, cpath, child, level + 1, mode, max_depth, include, exclude
            )
    return out


# --- random trees ----------------------------------------------------------


def _random_tree(rng: random.Random, depth: int = 3):
    names = ["alpha", "beta", "x1", ".hid", "data", "v2", "media"]
    files = ["a.mp4", "b.txt", ".dot.mp4", "c2.MP4", "plain", "d.tar.gz"]
    tree: dict = {}
    for _ in range(rng.randint(1, 4)):
        tree[rng.choice(files)] = None
    if depth > 0:
        for _ in range(rng.randint(0, 3)):
            tree[rng.choice(names)] = _random_tree(rng, depth - 1)
    return tree


def _flatten_files(tree, prefix):
    urls = []
    for child, sub in sorted(tree.items()):
        p = f"{prefix}/{child}"
        if sub is None:
            urls.append(p)
        else:
            urls.extend(_flatten_files(sub, p))
    return urls


FILTERS = [
    (None, None),
    ({"ext": "^mp4$"}, None),
    ({"dir": "^(alpha|data)$"}, None),
    ({"all": "alpha"}, {"ext": "txt"}),
]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_universe_matches_reference_model(spark, seed):
    rng = random.Random(seed)
    tree = _random_tree(rng)
    urls = ["http://host" + u[len(""):] for u in _flatten_files(tree, "")]
    if not urls:
        pytest.skip("degenerate tree")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for mode in MODES:
        for max_depth in (0, 1, 3):
            for include, exclude in FILTERS:
                got = {
                    (r["path"], r["is_dir"])
                    for r in entry_universe(
                        df, mode, max_depth, include, exclude
                    ).collect()
                }
                want = set()
                for p, is_dir in _model_entries(
                    tree, "host", "host", 0, mode, max_depth, include, exclude
                ):
                    # file rows keep the scheme; dir rows are scheme-less
                    want.add((("http://" + p) if not is_dir else p, is_dir))
                # the table only knows dirs that contain at least one file
                # somewhere below them; the model sees empty dirs too
                want = {
                    (p, d)
                    for p, d in want
                    if not d or any(u.startswith("http://" + p + "/") for u in urls)
                }
                assert got == want, (mode, max_depth, include, exclude)
