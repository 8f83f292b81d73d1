"""Setuptools shim.

All metadata lives in pyproject.toml (PEP 621). This file exists so that
offline environments whose setuptools predates PEP 660 support (or that
lack the `wheel` package, making `pip install -e .` fail while building
the editable wheel) can still do a legacy editable install:

    pip install -e . --no-build-isolation --config-settings editable_mode=compat
    # or, where pip rejects PEP 517 editables outright:
    pip install -e . --no-build-isolation --no-use-pep517
"""

from setuptools import setup

setup()
