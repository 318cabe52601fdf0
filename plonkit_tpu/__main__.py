"""`python -m plonkit_tpu` == the plonkit-compatible CLI
(console script `plonkit-tpu`, mirroring the reference binary
/root/reference/src/bin/main.rs)."""

from .cli import main

if __name__ == "__main__":
    main()
