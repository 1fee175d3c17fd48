"""Import-only scipy shim: the reference's analysis/similarity.py imports
scipy.sparse at module load, but this sandbox ships no scipy.  The drop-in
suite patches SkipgramSimilarity/KeywordList to this repo's scipy-free
implementations BEFORE any reference code runs, so the shim only needs to
make the import statement succeed — any actual attribute use would mean
the patch failed, and the loud error below is the right outcome."""
