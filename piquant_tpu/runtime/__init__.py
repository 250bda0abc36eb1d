"""piquant_tpu.runtime — native host-side runtime (C++ via ctypes)."""

from piquant_tpu.runtime.host import (  # noqa: F401
    HostContext,
    host_available,
)
