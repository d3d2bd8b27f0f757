"""Build the native host-ops extension:

    cd native && python setup.py build_ext --inplace

The built module is picked up by snipper_tpu.data.native_ops (which falls
back to pure numpy when absent).
"""

from setuptools import Extension, setup

setup(
    name="snipper-native",
    ext_modules=[
        Extension(
            "_snipper_imageops",
            sources=["imageops.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
        )
    ],
)
