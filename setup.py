"""Package build with the optional native host-ops extension.

The C++ extension (`native/imageops.cpp`: fused flip+warp+normalize+color
patch extraction — the role cv2 plays in the reference's
``datasets/transforms.py:137-144`` — plus a Jonker-Volgenant assignment)
is a pure speedup: `snipper_tpu.data.native_ops` falls back to numpy when
it is absent, so a failed native build must not fail the install. Metadata
lives in pyproject.toml; this file only adds the best-effort ext_module.
"""

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """Build the native extension if a toolchain exists; warn otherwise.

    Scope the catch to the single extension build (``optional=True``
    already makes compiler errors non-fatal; this adds a loud, actionable
    warning) — a broader catch around ``run()`` would also swallow real
    packaging bugs as "toolchain missing"."""

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as e:  # noqa: BLE001 - toolchain/compile failure
            self._warn(e)

    @staticmethod
    def _warn(e):
        import warnings

        warnings.warn(
            f"native extension build failed ({e!r}); snipper_tpu will use "
            "the pure-numpy host-op fallbacks (≈10x slower host "
            "preprocessing — see BASELINE.md 'Host input pipeline')",
            stacklevel=1)


setup(
    ext_modules=[
        Extension(
            "_snipper_imageops",
            sources=["native/imageops.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
