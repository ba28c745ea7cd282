"""Generate a small synthetic FASTQ workload for end-to-end verification.

Writes reads.fastq, reads.fastq.gz, ReadFiles.txt, GzFiles.txt and
genome.txt into the current directory (or argv[1]).
"""

import gzip
import os
import sys

import numpy as np


def main(outdir: str = ".", genome_len: int = 20_000, n_reads: int = 2000,
         read_len: int = 100, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    genome = "".join(bases[i] for i in rng.integers(0, 4, size=genome_len))
    fq_path = os.path.join(outdir, "reads.fastq")
    with open(fq_path, "w") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, genome_len - read_len))
            seq = list(genome[s : s + read_len])
            for j in range(read_len):
                r = rng.random()
                if r < 0.005:
                    seq[j] = bases[int(rng.integers(0, 4))]
                elif r < 0.007:
                    seq[j] = "N"
            if rng.random() < 0.5:
                seq = [comp[c] for c in reversed(seq)]
            f.write(f"@r{i}\n{''.join(seq)}\n+\n{'I' * read_len}\n")
    with open(fq_path, "rb") as f, gzip.open(fq_path + ".gz", "wb") as g:
        g.write(f.read())
    with open(os.path.join(outdir, "ReadFiles.txt"), "w") as f:
        f.write("reads.fastq\n")
    with open(os.path.join(outdir, "GzFiles.txt"), "w") as f:
        f.write("reads.fastq.gz\n")
    with open(os.path.join(outdir, "genome.txt"), "w") as f:
        f.write(genome + "\n")
    print(f"wrote {n_reads} x {read_len}bp reads over a {genome_len}bp genome")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
