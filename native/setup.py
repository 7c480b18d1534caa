"""Build the native PLY codec: ``python native/setup.py build_ext --inplace``
(run from the repo root; the module lands next to the package)."""

from setuptools import Extension, setup

setup(
    name="gausplat-tpu-native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "_gausplat_native",
            sources=["native/ply_codec.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
)
