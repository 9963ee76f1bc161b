"""Build the native data-pipeline extension:

    cd native && python setup.py build_ext --inplace
    (or `make native` from the repo root)

The wrapper human_pose_tpu/data/native.py falls back to pure-Python/NumPy
implementations when the extension is absent.
"""

from setuptools import Extension, setup

setup(
    name="hp_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "hp_native",
            sources=["hp_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-march=native"],
            language="c++",
        )
    ],
)
