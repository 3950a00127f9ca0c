from .hashing import LSH_DIM, LSH_PLANES, MINHASH_SEEDS, lsh_planes

__all__ = ["LSH_DIM", "LSH_PLANES", "MINHASH_SEEDS", "lsh_planes"]
