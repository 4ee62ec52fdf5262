"""Model downloader: registry, resumable HTTP, MD5 verify, HF snapshots.

Re-implements the reference's downloader contract
(/root/reference/nesr/utils/downloader.py): the MODELS registry (:20-51),
platform storage dirs + NESR_MODELS_DIR override (:53-80), existence checks
(:94-123), resumable Range-header downloads (:155-173), MD5 verification
(:210-217), HF snapshot downloads (:230-272), weighted aggregate progress
(:297-324), and a ``__main__`` CLI (:387-423).

Host-side Python only — nothing here touches the TPU compute path.
"""

from __future__ import annotations

import hashlib
import logging
import os
import sys

logger = logging.getLogger("nesr.downloader")

__all__ = ["MODELS", "get_models_dir", "get_model_path", "check_models_exist",
           "calculate_md5", "download_file", "download_huggingface_model",
           "download_models", "get_model_info"]

MODELS = {
    "esrgan_x2": {
        "name": "Real-ESRGAN x2 Model",
        "url": ("https://github.com/xinntao/Real-ESRGAN/releases/download/"
                "v0.2.5.0/RealESRGAN_x2plus.pth"),
        "path": "weights/RealESRGAN_x2plus.pth",
        "size": 67010191,
        "md5": "5db904e3e9f0dbf5c64b7ae665527e62",
        "required": True,
    },
    "esrgan_x4": {
        "name": "Real-ESRGAN x4 Model",
        "url": ("https://github.com/xinntao/Real-ESRGAN/releases/download/"
                "v0.1.0/RealESRGAN_x4plus.pth"),
        "path": "weights/RealESRGAN_x4plus.pth",
        "size": 67010191,
        "md5": "94df4e7c584b55e2e9a5d2b8f161860e",
        "required": False,
    },
    "swinir": {
        # Optional third upscaling branch (use_swinir) — the published
        # real-world SwinIR-M x4 GAN checkpoint. The reference documents
        # this model but never implements it (nesr.py:37,
        # standalone/superres_project.py:288-296); here it is real
        # (models/swinir.py). No MD5 published for this release asset.
        "name": "SwinIR Real-World x4 Model",
        "url": ("https://github.com/JingyunLiang/SwinIR/releases/download/"
                "v0.0/003_realSR_BSRGAN_DFO_s64w8_SwinIR-M_x4_GAN.pth"),
        "path": "weights/SwinIR_realSR_M_x4_GAN.pth",
        "size": None,
        "required": False,
    },
    "sd_upscaler": {
        "name": "Stable Diffusion Upscaler",
        "huggingface_id": "stabilityai/stable-diffusion-x4-upscaler",
        "path": None,
        "size": 1789525015,
        "required": True,
    },
    "segmentation": {
        "name": "Segmentation Model",
        "huggingface_id": "nvidia/segformer-b0-finetuned-ade-512-512",
        "path": None,
        "size": 31256892,
        "required": True,
    },
}


def get_models_dir() -> str:
    """Model storage dir: NESR_MODELS_DIR override, else platform default."""
    if "NESR_MODELS_DIR" in os.environ:
        models_dir = os.environ["NESR_MODELS_DIR"]
        os.makedirs(models_dir, exist_ok=True)
        return models_dir
    if sys.platform == "win32":
        base_dir = os.path.join(os.environ.get("APPDATA", ""), "NESR")
    elif sys.platform == "darwin":
        base_dir = os.path.join(os.path.expanduser("~"), "Library",
                                "Application Support", "NESR")
    else:
        base_dir = os.path.join(os.path.expanduser("~"), ".nesr")
    models_dir = os.path.join(base_dir, "models")
    os.makedirs(os.path.join(models_dir, "weights"), exist_ok=True)
    return models_dir


def get_model_path(model_key: str) -> str:
    models_dir = get_models_dir()
    info = MODELS[model_key]
    if info.get("path"):
        return os.path.join(models_dir, info["path"])
    # HF snapshots live under the repo-id tail — the same directory
    # download_huggingface_model and check_models_exist use.
    return os.path.join(models_dir, "huggingface",
                        info["huggingface_id"].split("/")[-1])


def check_models_exist() -> dict[str, bool]:
    """Map model key -> whether its weights are locally available."""
    result = {}
    models_dir = get_models_dir()
    for key, info in MODELS.items():
        if info.get("huggingface_id"):
            local = get_model_path(key)
            if os.path.isdir(local) and os.listdir(local):
                result[key] = True
                continue
            try:
                import huggingface_hub
                result[key] = huggingface_hub.model_info(
                    info["huggingface_id"], token=None,
                    local_files_only=True) is not None
            except Exception:
                result[key] = False
        elif info.get("path"):
            result[key] = os.path.exists(
                os.path.join(models_dir, info["path"]))
        else:
            result[key] = False
    return result


def calculate_md5(file_path: str) -> str:
    h = hashlib.md5()
    with open(file_path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_file(url: str, dest_path: str, expected_size: int | None = None,
                  expected_md5: str | None = None,
                  progress_callback=None) -> bool:
    """Resumable chunked download with Range headers + MD5 verification."""
    import requests

    os.makedirs(os.path.dirname(dest_path) or ".", exist_ok=True)
    temp_path = dest_path + ".partial"
    resume_pos = os.path.getsize(temp_path) if os.path.exists(temp_path) else 0
    headers = {"Range": f"bytes={resume_pos}-"} if resume_pos else {}

    try:
        with requests.get(url, stream=True, headers=headers,
                          timeout=30) as resp:
            if resp.status_code == 416:  # range beyond EOF: already complete
                pass
            elif resp.status_code not in (200, 206):
                logger.error("Download failed: HTTP %s", resp.status_code)
                return False
            else:
                if resp.status_code == 200:
                    resume_pos = 0  # server ignored the range; start over
                total = int(resp.headers.get("content-length", 0)) + resume_pos
                mode = "ab" if resume_pos else "wb"
                done = resume_pos
                with open(temp_path, mode) as f:
                    for chunk in resp.iter_content(chunk_size=1 << 20):
                        f.write(chunk)
                        done += len(chunk)
                        if progress_callback and total:
                            progress_callback(done / total)
    except Exception as exc:
        logger.error("Download error: %s (partial file kept for resume)", exc)
        return False

    if expected_md5:
        actual = calculate_md5(temp_path)
        if actual != expected_md5:
            logger.error("MD5 mismatch: expected %s got %s", expected_md5,
                         actual)
            os.remove(temp_path)
            return False
    if expected_size and abs(os.path.getsize(temp_path) - expected_size) > (
            expected_size * 0.05):
        logger.warning("Size mismatch for %s", dest_path)
    os.replace(temp_path, dest_path)
    return True


def download_huggingface_model(model_key: str, progress_callback=None) -> bool:
    info = MODELS[model_key]
    try:
        from huggingface_hub import snapshot_download
        snapshot_download(info["huggingface_id"],
                          local_dir=get_model_path(model_key))
        if progress_callback:
            progress_callback(1.0)
        return True
    except Exception as exc:
        logger.error("HuggingFace download failed for %s: %s", model_key, exc)
        return False


def download_models(model_keys=None, progress_callback=None) -> dict[str, bool]:
    """Download required (or requested) models with weighted progress."""
    if model_keys is None:
        model_keys = [k for k, v in MODELS.items() if v.get("required")]
    existing = check_models_exist()
    to_get = [k for k in model_keys if not existing.get(k)]
    results = {k: True for k in model_keys if existing.get(k)}

    # entries without a published size (e.g. swinir) weigh a nominal 64 MB
    _w = lambda k: MODELS[k]["size"] or (64 << 20)  # noqa: E731
    total_size = sum(_w(k) for k in to_get) or 1
    done_size = 0
    for key in to_get:
        info = MODELS[key]

        def agg(frac, _key=key):
            if progress_callback:
                progress_callback(
                    (done_size + frac * _w(_key)) / total_size)

        if info.get("huggingface_id"):
            ok = download_huggingface_model(key, agg)
        else:
            ok = download_file(info["url"], get_model_path(key),
                              info.get("size"), info.get("md5"), agg)
        results[key] = ok
        done_size += _w(key)
        logger.info("%s: %s", info["name"], "ok" if ok else "FAILED")
    return results


def get_model_info() -> dict:
    """Registry + existence + paths (for UIs and CLIs)."""
    existing = check_models_exist()
    return {k: {"name": v["name"], "size": v["size"],
                "required": v.get("required", False),
                "exists": existing.get(k, False),
                "path": get_model_path(k)}
            for k, v in MODELS.items()}


def _main(argv=None):  # pragma: no cover - thin CLI
    import argparse
    parser = argparse.ArgumentParser(description="NESR-TPU model downloader")
    parser.add_argument("--models", nargs="*", default=None,
                        help="model keys to download (default: required)")
    parser.add_argument("--info", action="store_true")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.info:
        for key, info in get_model_info().items():
            print(f"{key}: {info}")
        return
    results = download_models(args.models)
    for key, ok in results.items():
        print(f"{key}: {'ok' if ok else 'FAILED'}")


if __name__ == "__main__":  # pragma: no cover
    _main()
