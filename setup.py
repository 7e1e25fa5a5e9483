"""Build script for the native IO runtime (tpuflow._fastio).

The pure-Python package works without it; `python setup.py build_ext
--inplace` (or pip install) compiles the C++ frame codec/prefetcher and
tpuflow.io picks it up automatically.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "tpuflow._fastio",
            sources=["native/fastio.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ]
)
