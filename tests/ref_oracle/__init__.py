"""End-to-end reference-oracle harness.

Runs the ACTUAL reference implementation (/root/reference/fumi — PyTorch,
eager, unmodified files) against this repo's TPU-native rebuild on one
shared synthetic iNat-Anim directory, and compares final test metrics.

The reference's third-party runtime deps that are not installed in this
image (torchmeta, gensim, wandb) are provided as minimal, faithful shims
under ``tests/ref_oracle/shims/`` — see each shim's docstring for the
exact API subset it reproduces and the torchmeta-1.7.0 semantics it
follows. The reference's OWN code (models, training loops, episodic
math, dataset parsing) runs byte-identical from /root/reference.
"""
