"""Multi-device (mesh) execution: sharded hashing, lookup and count
merging. Replaces the reference's fork()+POSIX-shm worklist parallelism
(shared_mem.py, SURVEY.md §2 L7) with jax.sharding over a device mesh."""
