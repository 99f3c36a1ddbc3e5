from boa_tpu.cli import run

if __name__ == "__main__":
    run()
