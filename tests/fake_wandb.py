"""In-memory wandb stand-in for exercising the artifact/resume flow.

Implements exactly the surface sde_sampler_tpu.utils.wandb uses:
init (with id/resume semantics), run.{id,path,config,summary,settings,
resumed,use_artifact}, Artifact/log_artifact with 'latest' aliasing,
Api().run().logged_artifacts() with alias-based GC, CommError, log,
finish, Image. The "server" is module state, so a second init() with the
same id within a process simulates a requeued (preempted) job.
"""
from __future__ import annotations

import shutil
from pathlib import Path


class CommError(Exception):
    pass


class Image:
    def __init__(self, obj):
        self.obj = obj


class _Settings:
    def __init__(self, mode="run"):
        self.mode = mode


class _ArtifactFile:
    def __init__(self, src: Path, name: str):
        self.name = name
        self.payload = Path(src).read_bytes()


class Artifact:
    def __init__(self, name, type=None, metadata=None):
        self.name = name
        self.type = type
        self.metadata = metadata or {}
        self.files: list[_ArtifactFile] = []
        self.aliases: list[str] = []
        self.deleted = False
        self.version = None

    def add_file(self, path, name=None):
        self.files.append(_ArtifactFile(Path(path), name or Path(path).name))

    def download(self, root):
        root = Path(root)
        for f in self.files:
            dst = root / f.name
            dst.parent.mkdir(parents=True, exist_ok=True)
            dst.write_bytes(f.payload)
        return str(root)

    def delete(self):
        self.deleted = True


class _Server:
    def __init__(self):
        self.runs: dict[str, dict] = {}
        self.artifacts: dict[str, list[Artifact]] = {}

    def log_artifact(self, run_id, artifact):
        versions = self.artifacts.setdefault(run_id, [])
        for old in versions:
            if "latest" in old.aliases:
                old.aliases.remove("latest")
        artifact.aliases.append("latest")
        artifact.version = len(versions)
        versions.append(artifact)

    def latest_artifact(self, run_id):
        for art in reversed(self.artifacts.get(run_id, [])):
            if not art.deleted and "latest" in art.aliases:
                return art
        raise CommError(f"no artifact for {run_id}")


_server = _Server()
run = None


class Run:
    def __init__(self, id, config, resumed, mode="run"):
        self.id = id
        self.path = f"fake/project/{id}"
        self.config = config
        self.summary = {}
        self.settings = _Settings(mode)
        self.resumed = resumed
        self.history: list[dict] = []

    def use_artifact(self, spec: str):
        run_id = spec.split(":", 1)[0]
        return _server.latest_artifact(run_id)


class _ApiRun:
    def __init__(self, run_id):
        self.run_id = run_id

    def logged_artifacts(self):
        return [a for a in _server.artifacts.get(self.run_id, []) if not a.deleted]


class Api:
    def run(self, path):
        return _ApiRun(path.rsplit("/", 1)[-1])


def init(id=None, config=None, resume=None, mode="run", **kwargs):
    global run
    resumed = False
    stored_config = dict(config or {})
    if id in _server.runs:
        if resume in ("allow", "must", True):
            resumed = True
            stored_config = dict(_server.runs[id]["config"])
        else:
            stored_config = dict(config or {})
    _server.runs[id] = {"config": stored_config}
    run = Run(id=id, config=stored_config, resumed=resumed, mode=mode)
    return run


def log(metrics, step=None, commit=True):
    if run is not None:
        run.history.append({"step": step, **{k: v for k, v in metrics.items()}})


def log_artifact(artifact):
    _server.log_artifact(run.id, artifact)


def finish(exit_code=None):
    global run
    run = None


def reset():
    """Clear the fake server (per-test isolation)."""
    global run
    run = None
    _server.runs.clear()
    _server.artifacts.clear()
