"""MatcherService: batched serving must equal direct match_many calls."""
import threading

import numpy as np

import openfdcm_tpu as of
from openfdcm_tpu.serving import MatcherService
from tests.utils import create_lines, make_rotation, apply_transform


def _setup(n_tmpl=6, n_scenes=7):
    templates = [np.asarray(create_lines(4 + (i % 4), 40.0 + 8.0 * (i % 3)))
                 for i in range(n_tmpl)]
    scenes = []
    for j in range(n_scenes):
        mat = np.concatenate([make_rotation(0.21 * j),
                              np.full((2, 1), 4.0 + j, np.float32)], axis=1)
        scenes.append(apply_transform(templates[j % n_tmpl], mat))
    return templates, scenes


PARAMS = of.Dt3Params(4, 5.0, 2.2, of.Distance.L2)


def test_service_matches_direct_calls():
    templates, scenes = _setup()
    lengths = of.get_template_lengths(templates)
    direct = of.match_many(scenes, templates, PARAMS, of.DefaultSearch(4, 10),
                           of.BatchOptimize(10),
                           penalty=of.ExponentialPenalty(1.5),
                           template_lengths=lengths, top_k=4)
    with MatcherService(templates, PARAMS, of.DefaultSearch(4, 10),
                        of.BatchOptimize(10), top_k=4,
                        penalty=of.ExponentialPenalty(1.5),
                        template_lengths=lengths,
                        max_batch_delay_s=0.05) as svc:
        futs = [svc.submit(s) for s in scenes]
        served = [f.result(timeout=600) for f in futs]
    for d, s in zip(direct, served):
        assert len(d) == len(s) > 0
        np.testing.assert_allclose(
            sorted(m.score for m in d), sorted(m.score for m in s),
            rtol=1e-5, atol=1e-7)
        assert sorted((round(m.score, 5), m.tmpl_idx) for m in d) == \
            sorted((round(m.score, 5), m.tmpl_idx) for m in s)


def test_service_concurrent_submitters():
    templates, scenes = _setup(n_scenes=6)
    results = [None] * len(scenes)
    with MatcherService(templates, PARAMS, of.DefaultSearch(4, 10),
                        of.BatchOptimize(10), top_k=3,
                        max_batch_delay_s=0.05) as svc:
        svc.warmup(scenes[:1])

        def worker(i):
            results[i] = svc.match(scenes[i], timeout=600)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(scenes))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert all(r is not None and len(r) > 0 for r in results)
    # concurrent serving returns exactly what direct calls return
    direct = of.match_many(scenes, templates, PARAMS, of.DefaultSearch(4, 10),
                           of.BatchOptimize(10), top_k=3)
    for d, r in zip(direct, results):
        assert sorted((round(m.score, 5), m.tmpl_idx) for m in d) == \
            sorted((round(m.score, 5), m.tmpl_idx) for m in r)


def test_service_close_rejects_new_work():
    templates, scenes = _setup(n_scenes=1)
    svc = MatcherService(templates, PARAMS, of.DefaultSearch(4, 10),
                         of.BatchOptimize(10), top_k=2)
    assert len(svc.match(scenes[0], timeout=600)) > 0
    svc.close()
    try:
        svc.submit(scenes[0])
        raise AssertionError("submit after close must raise")
    except RuntimeError:
        pass


def test_service_zero_delay_dispatches_immediately():
    """max_batch_delay_s=0 must dispatch a lone request without waiting for
    max_batch scenes (regression: 0 used to mean 'wait forever')."""
    templates, scenes = _setup(n_scenes=1)
    with MatcherService(templates, PARAMS, of.DefaultSearch(4, 10),
                        of.BatchOptimize(10), top_k=3,
                        max_batch=16, max_batch_delay_s=0.0) as svc:
        res = svc.match(scenes[0], timeout=600)
    assert len(res) > 0


def test_service_close_fails_raced_requests():
    templates, scenes = _setup(n_scenes=1)
    svc = MatcherService(templates, PARAMS, of.DefaultSearch(4, 10),
                         of.BatchOptimize(10), top_k=3)
    svc.match(scenes[0], timeout=600)       # warm once
    # a request that lands after the close marker can never be dispatched;
    # close() must fail it rather than drop it
    svc._closed.set()
    svc._queue.put(None)
    fut = of.serving.Future()
    svc._queue.put((np.asarray(scenes[0], np.float32), fut))
    svc.close()
    try:
        fut.result(timeout=5)
        raised = False
    except RuntimeError:
        raised = True
    assert raised
