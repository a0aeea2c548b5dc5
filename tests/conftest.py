import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPUs (SURVEY.md section 4). Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not honored when an accelerator plugin (axon) is
# present -- force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/decafnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def setup_reference_imports(need_nms=False):
    """Make /root/reference importable: stub the modules its dead code pulls
    in (torchvision/decord/torchtext), neutralize hardcoded .cuda()
    placement (torch here is CPU-only), and optionally JIT-build its C++
    NMS extension into a cache dir. Used by the oracle tests."""
    import os
    import sys
    import types

    import torch

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.v2", "decord", "torchtext",
                 "torchtext.data", "torchtext.vocab"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = []  # behave like a package for submodule imports
            sys.modules[name] = mod
    sys.modules["torchvision"].transforms = \
        sys.modules["torchvision.transforms"]
    sys.modules["torchvision.transforms"].v2 = \
        sys.modules["torchvision.transforms.v2"]
    sys.modules["torchtext"].data = sys.modules["torchtext.data"]
    sys.modules["torchtext.data"].get_tokenizer = lambda *a, **k: None
    sys.modules["torchtext"].vocab = sys.modules["torchtext.vocab"]
    sys.modules["torchtext.vocab"].GloVe = None
    sys.modules["decord"].bridge = types.SimpleNamespace(
        set_bridge=lambda *a, **k: None)

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    if need_nms and "nms_1d_cpu_vg" not in sys.modules:
        from torch.utils import cpp_extension
        build_dir = os.path.expanduser("~/.cache/decafnet_tpu/ref_nms")
        os.makedirs(build_dir, exist_ok=True)
        lock = os.path.join(build_dir, "lock")
        if os.path.exists(lock):  # stale lock from an interrupted build
            os.remove(lock)
        sys.modules["nms_1d_cpu_vg"] = cpp_extension.load(
            name="nms_1d_cpu_vg",
            sources=["/root/reference/libs/nms/src/nms_cpu.cpp"],
            extra_cflags=["-O3"], build_directory=build_dir, verbose=False)
