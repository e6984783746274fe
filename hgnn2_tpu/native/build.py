"""Build the native library: python -m hgnn2_tpu.native.build"""

from hgnn2_tpu import native

if __name__ == "__main__":
    print(native.build(force=True))
