"""TEST-ONLY faithful transcription of pycocotools' keypoint COCOeval.

PROVENANCE / LICENSE: this module transcribes the keypoint path of
``pycocotools/cocoeval.py`` (Copyright (c) 2014 Piotr Dollar and Tsung-Yi
Lin, BSD 2-Clause) — ``computeOks``, ``evaluateImg``, ``accumulate`` and
the keypoint ``summarize`` — plus the detection-loading behavior of
``COCO.loadRes``.  pycocotools is not installed in this image; this
transcription exists SOLELY as the differential-test oracle for the
production evaluator ``rtpe_tpu/eval/cocoeval.py`` (which is implemented
from the protocol, not from this code).  It is deliberately written
loop-for-loop like upstream, readability be damned, so that any
divergence found by ``tests/test_cocoeval_differential.py`` indicts the
production code and not the oracle.
"""

import copy

import numpy as np

SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89]) / 10.0


class PycocoKptEval:
    """Keypoint-only COCOeval over in-memory gt/dt annotation lists.

    :param gt_anns: COCO annotation dicts (id, image_id, keypoints,
      num_keypoints, iscrowd, area, bbox).
    :param dt_anns: COCO results dicts (image_id, keypoints, score).
    :param img_ids: images to evaluate.
    """

    def __init__(self, gt_anns, dt_anns, img_ids, sigmas=SIGMAS):
        self.sigmas = np.asarray(sigmas)
        self.imgIds = list(img_ids)
        self.iouThrs = np.linspace(.5, 0.95,
                                   int(np.round((0.95 - .5) / .05)) + 1,
                                   endpoint=True)
        self.recThrs = np.linspace(.0, 1.00,
                                   int(np.round((1.00 - .0) / .01)) + 1,
                                   endpoint=True)
        self.maxDets = [20]
        self.areaRng = [[0 ** 2, 1e5 ** 2], [32 ** 2, 96 ** 2],
                        [96 ** 2, 1e5 ** 2]]
        self.areaRngLbl = ['all', 'medium', 'large']

        # ---- COCO.loadRes keypoint behavior: dt ids + kpt-extent area
        self._gts = {}
        self._dts = {}
        for img_id in self.imgIds:
            self._gts[img_id] = []
            self._dts[img_id] = []
        for g in copy.deepcopy(gt_anns):
            # _prepare: crowd or zero-keypoint gts are ignore
            g['ignore'] = g['ignore'] if 'ignore' in g else 0
            g['ignore'] = ('iscrowd' in g and g['iscrowd']) or g['ignore']
            g['ignore'] = (g['num_keypoints'] == 0) or g['ignore']
            if g['image_id'] in self._gts:
                self._gts[g['image_id']].append(g)
        for i, d in enumerate(copy.deepcopy(dt_anns)):
            s = d['keypoints']
            x = s[0::3]
            y = s[1::3]
            x0, x1, y0, y1 = np.min(x), np.max(x), np.min(y), np.max(y)
            d['area'] = (x1 - x0) * (y1 - y0)
            d['id'] = i + 1
            d['bbox'] = [x0, y0, x1 - x0, y1 - y0]
            if d['image_id'] in self._dts:
                self._dts[d['image_id']].append(d)

    # ---- COCOeval.computeOks, verbatim logic
    def computeOks(self, imgId):
        p = self
        gts = self._gts[imgId]
        dts = self._dts[imgId]
        inds = np.argsort([-d['score'] for d in dts], kind='mergesort')
        dts = [dts[i] for i in inds]
        if len(dts) > p.maxDets[-1]:
            dts = dts[0:p.maxDets[-1]]
        if len(gts) == 0 or len(dts) == 0:
            return []
        ious = np.zeros((len(dts), len(gts)))
        sigmas = self.sigmas
        vars = (sigmas * 2) ** 2
        k = len(sigmas)
        for j, gt in enumerate(gts):
            g = np.array(gt['keypoints'])
            xg = g[0::3]
            yg = g[1::3]
            vg = g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt['bbox']
            x0 = bb[0] - bb[2]
            x1 = bb[0] + bb[2] * 2
            y0 = bb[1] - bb[3]
            y1 = bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt['keypoints'])
                xd = d[0::3]
                yd = d[1::3]
                if k1 > 0:
                    dx = xd - xg
                    dy = yd - yg
                else:
                    z = np.zeros((k))
                    dx = np.max((z, x0 - xd), axis=0) \
                        + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) \
                        + np.max((z, yd - y1), axis=0)
                e = (dx ** 2 + dy ** 2) / vars \
                    / (gt['area'] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    # ---- COCOeval.evaluateImg, verbatim logic
    def evaluateImg(self, imgId, aRng, maxDet, ious_full):
        p = self
        gt = self._gts[imgId]
        dt = self._dts[imgId]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            if g['ignore'] or (g['area'] < aRng[0] or g['area'] > aRng[1]):
                g['_ignore'] = 1
            else:
                g['_ignore'] = 0
        gtind = np.argsort([g['_ignore'] for g in gt], kind='mergesort')
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d['score'] for d in dt], kind='mergesort')
        dt = [dt[i] for i in dtind[0:maxDet]]
        iscrowd = [int(o['iscrowd']) for o in gt]
        ious = ious_full[:, gtind] if len(ious_full) > 0 else ious_full

        T = len(p.iouThrs)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g['_ignore'] for g in gt])
        dtIg = np.zeros((T, D))
        if not len(ious) == 0:
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min([t, 1 - 1e-10])
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]['id']
                    gtm[tind, m] = d['id']
        a = np.array([d['area'] < aRng[0] or d['area'] > aRng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return {
            'dtIds': [d['id'] for d in dt],
            'gtIds': [g['id'] for g in gt],
            'dtMatches': dtm,
            'gtMatches': gtm,
            'dtScores': [d['score'] for d in dt],
            'gtIgnore': gtIg,
            'dtIgnore': dtIg,
        }

    # ---- COCOeval.evaluate + accumulate + summarize (kps), K=1, M=1
    def run(self):
        p = self
        self.ious = {imgId: self.computeOks(imgId)
                     for imgId in p.imgIds}
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, areaRng, maxDet, self.ious[imgId])
            for areaRng in p.areaRng
            for imgId in p.imgIds
        ]

        T = len(p.iouThrs)
        R = len(p.recThrs)
        A = len(p.areaRng)
        M = len(p.maxDets)
        precision = -np.ones((T, R, A, M))
        recall = -np.ones((T, A, M))
        nimgs = len(p.imgIds)
        for a in range(A):
            for m, maxDet in enumerate(p.maxDets):
                E = self.evalImgs[a * nimgs:(a + 1) * nimgs]
                E = [e for e in E if e is not None]
                if len(E) == 0:
                    continue
                dtScores = np.concatenate(
                    [e['dtScores'][0:maxDet] for e in E])
                inds = np.argsort(-dtScores, kind='mergesort')
                dtm = np.concatenate(
                    [e['dtMatches'][:, 0:maxDet] for e in E],
                    axis=1)[:, inds]
                dtIg = np.concatenate(
                    [e['dtIgnore'][:, 0:maxDet] for e in E],
                    axis=1)[:, inds]
                gtIg = np.concatenate([e['gtIgnore'] for e in E])
                npig = np.count_nonzero(gtIg == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dtIg))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dtIg))
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                    tp = np.array(tp)
                    fp = np.array(fp)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    if nd:
                        recall[t, a, m] = rc[-1]
                    else:
                        recall[t, a, m] = 0
                    pr = pr.tolist()
                    q = q.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, p.recThrs, side='left')
                    try:
                        for ri, pi in enumerate(inds):
                            q[ri] = pr[pi]
                    except Exception:
                        pass
                    precision[t, :, a, m] = np.array(q)
        self.precision = precision
        self.recall = recall
        return self.summarize()

    def _summarize(self, ap, iouThr=None, areaRng='all', maxDets=20):
        p = self
        aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
        mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
        if ap == 1:
            s = self.precision
            if iouThr is not None:
                t = np.where(iouThr == p.iouThrs)[0]
                s = s[t]
            s = s[:, :, aind, mind]
        else:
            s = self.recall
            if iouThr is not None:
                t = np.where(iouThr == p.iouThrs)[0]
                s = s[t]
            s = s[:, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    def summarize(self):
        return {
            "AP": self._summarize(1, maxDets=20),
            "Ap .5": self._summarize(1, maxDets=20, iouThr=.5),
            "AP .75": self._summarize(1, maxDets=20, iouThr=.75),
            "AP (M)": self._summarize(1, maxDets=20, areaRng='medium'),
            "AP (L)": self._summarize(1, maxDets=20, areaRng='large'),
            "AR": self._summarize(0, maxDets=20),
            "AR .5": self._summarize(0, maxDets=20, iouThr=.5),
            "AR .75": self._summarize(0, maxDets=20, iouThr=.75),
            "AR (M)": self._summarize(0, maxDets=20, areaRng='medium'),
            "AR (L)": self._summarize(0, maxDets=20, areaRng='large'),
        }
