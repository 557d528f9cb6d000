"""Distribution layer: device meshes, distributed matchers, sharded maps,
edge-sharded pose graph, multi-host entry.

Submodules are imported explicitly (``from loc_lib_tpu.parallel import
match``), NOT eagerly here: `multihost.init` must run before anything
touches a JAX backend, and sibling modules build module-level jnp constants
that would initialize it.
"""
