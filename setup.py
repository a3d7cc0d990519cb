"""Build the native fastpack extension (C++, CPython C API + numpy).

The package works without it (pure-numpy fallback); `pip install -e .
--no-build-isolation` compiles it when a toolchain is present.
"""

import numpy as np
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "transfusion_tpu._fastpack",
            sources=["csrc/fastpack.cpp"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ]
)
