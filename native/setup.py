"""Build the ctdnative C++ extension:  python native/setup.py build_ext --inplace
(or `make -C native`).  Installs ctdnative*.so next to the package so
comic_text_detector_tpu.native can load it; everything degrades to the
NumPy fallbacks when the extension is absent."""

import numpy as np
from setuptools import Extension, setup

setup(
    name="ctdnative",
    version="0.1.0",
    ext_modules=[
        Extension(
            "ctdnative",
            sources=["ctdnative.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17", "-fno-exceptions"],
        )
    ],
)
