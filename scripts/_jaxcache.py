"""Enable the persistent JAX compilation cache for profile/experiment scripts
(compiles through the axon tunnel cost minutes; the cache makes re-runs free).
Import BEFORE building any jitted function."""
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
