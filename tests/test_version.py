"""Runtime vs packaging-metadata version match (reference: tests/test_version.py)."""

import os
import re


def test_version_matches_pyproject():
    import viprs_tpu
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(repo, 'pyproject.toml')).read()
    meta_version = re.search(r'^version = "([^"]+)"', text, re.M).group(1)
    assert viprs_tpu.__version__ == meta_version
