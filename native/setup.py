"""Build the native I/O extension in place:

    cd native && python setup.py build_ext --inplace

(or let xrsfm_tpu.utils.native build it lazily on first import).
"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="xrsfm_native",
    ext_modules=[
        Extension(
            "xrsfm_native",
            sources=["xrsfm_native.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3"],
        )
    ],
)
