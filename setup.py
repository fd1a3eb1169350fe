"""Build config: compiles the native runtime extension
(``openfdcm_tpu._native`` — line-file codec, batch loader, search pairs;
see ``native/openfdcm_native.cpp``).  The package works without it (pure
Python fallbacks), so the extension is optional."""
from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    def run(self):
        try:
            super().run()
        except Exception as exc:  # noqa: BLE001
            print(f"WARNING: native extension build failed ({exc}); "
                  "falling back to pure-Python runtime components")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # noqa: BLE001
            print(f"WARNING: skipping {ext.name}: {exc}")


setup(
    ext_modules=[
        Extension(
            "openfdcm_tpu._native",
            sources=["native/openfdcm_native.cpp"],
            language="c++",
            extra_compile_args=["-O2", "-std=c++17"],
            libraries=["z", "pthread"],
        ),
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
